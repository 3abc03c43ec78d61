"""Jitted train/eval steps: forward + CTC loss + grads, SPMD-ready.

Replicates the reference's per-step math (SURVEY.md §3.1 hot loop):
conv/BiRNN/softmax forward -> ``ctc_lambda_func`` -> ``K.ctc_batch_cost`` —
but fully on-device (the reference's CTC kernel ran on the host CPU, paying a
device->host softmax copy every step).

Loss modes:
  * ``exact_keras``: softmax -> ctc_batch_cost (log(p+1e-7), re-log-softmax)
    — gradient-level parity with the reference.
  * fast path: log_softmax -> CTC directly (one fewer exp/log round trip,
    mathematically the eps-free limit). Default for new training runs.

Parallelism: the step is written for GSPMD — jit it with the batch sharded
over a ``('data',)`` mesh and params replicated (crnn_ocr_tpu.parallel).
XLA then inserts the gradient all-reduce and computes BatchNorm statistics
over the *global* batch (sync-BN for free). No explicit collectives needed —
this is the TPU-native equivalent of the reference's ``multi_gpu_model`` DP
(SURVEY.md §2.3 row P1).
"""

from __future__ import annotations

import functools
import sys
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.ops import ctc
from crnn_ocr_tpu.train.state import TrainState

# Pad the batch axis up to the 128-lane tile when it buys the Pallas CTC
# kernel; below this per-device batch the padding overhead (>2x kernel work)
# outweighs the kernel's win over the scan path.
_PALLAS_MIN_BATCH = 64

_logged_paths = set()


def _log_ctc_path(msg: str) -> None:
    """Trace-time, once-per-shape note of which CTC kernel path compiled."""
    if msg not in _logged_paths:
        _logged_paths.add(msg)
        print(f"[crnn_ocr_tpu] ctc path: {msg}", file=sys.stderr)


def _ctc_pallas_padded(
    log_probs, labels, input_length, label_length, interpret=False
):
    """Run the Pallas CTC kernel, padding the batch axis to the 128-lane
    tile if needed (padded rows: 1 frame, empty label — their loss/grad is
    sliced away; grads flow only into the real rows)."""
    from crnn_ocr_tpu.kernels.ctc_loss import ctc_loss_pallas

    B = log_probs.shape[0]
    Bp = -(-B // 128) * 128
    if Bp != B:
        pad = Bp - B
        log_probs = jnp.concatenate(
            [log_probs, jnp.zeros((pad,) + log_probs.shape[1:],
                                  log_probs.dtype)], 0
        )
        labels = jnp.concatenate(
            [labels, jnp.zeros((pad,) + labels.shape[1:], labels.dtype)], 0
        )
        input_length = jnp.concatenate(
            [input_length.reshape(B),
             jnp.ones((pad,), input_length.dtype)], 0
        )
        label_length = jnp.concatenate(
            [label_length.reshape(B),
             jnp.zeros((pad,), label_length.dtype)], 0
        )
    loss = ctc_loss_pallas(
        log_probs, labels, input_length, label_length, interpret
    )
    return loss[:B]


def ctc_loss_vec(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_length: jnp.ndarray,
    label_length: jnp.ndarray,
    ctc_time_slice: int = 2,
    exact_keras: bool = False,
    use_pallas: bool = False,
    mesh=None,
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """Per-sample CTC loss from raw logits, applying the reference's
    ``[:, 2:, :]`` warm-up-frame slice (C6). ``input_length`` must already
    be post-slice (pipeline.py handles that).

    ``use_pallas`` switches to the fused forward-backward kernel pair
    (kernels/ctc_loss.py, analytic gradient); identical numerics to the scan
    path (unit-tested). Batches that are not 128-lane-aligned are padded up
    to the tile (when that costs < 2x kernel work, i.e. per-device batch >=
    64); smaller batches take the scan path. Under a multi-device ``mesh``
    the kernel runs per shard via ``shard_map`` — a bare Pallas custom call
    has no GSPMD partitioning rule, so without this the sharded jit could
    fail to partition or silently replicate the full batch per device."""
    sliced = logits[:, ctc_time_slice:, :]
    if exact_keras:
        probs = jax.nn.softmax(sliced, axis=-1)
        return ctc.ctc_batch_cost(labels, probs, input_length, label_length)[
            :, 0
        ]
    log_probs = jax.nn.log_softmax(sliced, axis=-1)
    if use_pallas:
        B = log_probs.shape[0]
        n_shards = mesh.size if mesh is not None else 1
        B_loc = B // n_shards if B % n_shards == 0 else 0
        if B_loc >= _PALLAS_MIN_BATCH:
            input_length = input_length.reshape(B)
            label_length = label_length.reshape(B)
            if n_shards > 1:
                from jax.sharding import PartitionSpec as P

                _log_ctc_path(
                    f"pallas via shard_map (B={B} -> {B_loc}/device, "
                    f"padded to {-(-B_loc // 128) * 128})"
                )
                # check_vma=False: pallas_call out_shapes carry no varying-
                # mesh-axes metadata, which strict shard_map rejects.
                fn = jax.shard_map(
                    functools.partial(
                        _ctc_pallas_padded, interpret=pallas_interpret
                    ),
                    mesh=mesh,
                    in_specs=(P("data"), P("data"), P("data"), P("data")),
                    out_specs=P("data"),
                    check_vma=False,
                )
                return fn(log_probs, labels, input_length, label_length)
            _log_ctc_path(
                f"pallas (B={B}, padded to {-(-B // 128) * 128})"
                if B % 128
                else f"pallas (B={B})"
            )
            return _ctc_pallas_padded(
                log_probs, labels, input_length, label_length,
                interpret=pallas_interpret,
            )
        _log_ctc_path(f"scan (B={B} below pallas threshold)")
    return ctc.ctc_loss_from_log_probs(
        log_probs, labels, input_length, label_length
    )


def make_train_step(
    model_cfg: ModelConfig,
    exact_keras: bool = False,
    donate: bool = True,
    use_pallas_ctc: "bool | None" = None,
    mesh=None,
    pallas_interpret: bool = False,
):
    """Returns jitted ``train_step(state, batch, rng) -> (state, metrics)``.

    ``use_pallas_ctc=None`` auto-enables the fused Pallas CTC kernels on TPU
    backends (measured 1.45x on the full train step at B=128 on v5e: 2.21 ->
    1.53 ms); batches below the pad threshold fall back to the scan path
    either way. Pass ``mesh`` when the step runs GSPMD-sharded so the kernel
    executes per shard (see :func:`ctc_loss_vec`).

    Batches may carry an optional ``valid_mask`` (added by
    ``parallel.mesh.pad_batch_to``): the loss is then a masked mean, so
    divisibility padding contributes zero gradient, AND the mask is threaded
    into the model so BatchNorm batch statistics are computed over valid
    rows only — the padded step matches the unpadded step exactly,
    including updated batch_stats.
    """
    if use_pallas_ctc is None:
        use_pallas_ctc = jax.default_backend() in ("tpu", "axon")
    train_step = _train_step_fn(
        model_cfg, exact_keras, use_pallas_ctc, mesh, pallas_interpret
    )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _train_step_fn(
    model_cfg: ModelConfig,
    exact_keras: bool,
    use_pallas_ctc: bool,
    mesh,
    pallas_interpret: bool,
):
    """The unjitted train-step body — shared by the single-step jit
    (:func:`make_train_step`) and the K-step scan
    (:func:`make_multi_train_step`)."""

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        dropout_rng = jax.random.fold_in(rng, state.step)

        mask = batch.get("valid_mask")

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"][..., None],
                train=True,
                valid_mask=mask,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss_vec = ctc_loss_vec(
                logits,
                batch["the_labels"],
                batch["input_length"],
                batch["label_length"],
                ctc_time_slice=model_cfg.ctc_time_slice,
                exact_keras=exact_keras,
                use_pallas=use_pallas_ctc,
                mesh=mesh,
                pallas_interpret=pallas_interpret,
            )
            # Guard: an infeasible sample (label longer than frames) has
            # ~inf loss; clip its contribution so one bad line can't nuke
            # the step.
            loss_vec = jnp.minimum(loss_vec, 1e4)
            if mask is None:
                loss = jnp.mean(loss_vec)
            else:
                loss = jnp.sum(loss_vec * mask) / jnp.maximum(
                    jnp.sum(mask), 1.0
                )
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads).replace(
            batch_stats=new_stats
        )
        gnorm = optax_global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_multi_train_step(
    model_cfg: ModelConfig,
    exact_keras: bool = False,
    donate: bool = True,
    use_pallas_ctc: "bool | None" = None,
    mesh=None,
    pallas_interpret: bool = False,
    width_downsample: int = 4,
    normalize: bool = True,
    augment: bool = False,
    augment_seed: int = 0,
):
    """Returns jitted ``multi_step(state, stack, rng, bucket=W) ->
    (state, metrics)`` running K optimizer steps in ONE device dispatch.

    ``stack`` is a K-leading raw batch group from
    ``data.pipeline.stack_host_batches``: the fused preprocess (resize/pad/
    normalize, + optional augmentation) AND the train step both run inside a
    single ``lax.scan``, so K steps cost one host->device upload and one
    dispatch instead of 3K. The device math is identical to K sequential
    :func:`make_train_step` calls — the per-step dropout stream folds the
    same ``rng`` with ``state.step``, which increments inside the scan
    (bit-parity pinned by tests/test_train_multi.py).

    Why: on hosts where per-dispatch latency dominates (this environment's
    TPU tunnel has ~30-50 ms RTT; any 1-core host pays ~ms of Python per
    dispatch), the single-step path caps end-to-end training throughput far
    below the device ceiling. Measured attribution in
    benchmarks/input_gap_profile.json.

    Metrics are stacked per inner step: ``{"loss": (K,), "grad_norm": (K,)}``.

    Under a ``mesh``, shard the stack with
    ``parallel.mesh.shard_stacked_batch`` (batch axis 1 over 'data'); the
    scan body's per-step batches then carry the same sharding the
    single-step DP path uses.
    """
    if use_pallas_ctc is None:
        use_pallas_ctc = jax.default_backend() in ("tpu", "axon")
    core = _train_step_fn(
        model_cfg, exact_keras, use_pallas_ctc, mesh, pallas_interpret
    )
    from crnn_ocr_tpu.ops.preprocess import preprocess_batch

    if augment:
        from crnn_ocr_tpu.ops.augment import augment_batch

    def multi_step(
        state: TrainState,
        stack: Dict[str, jnp.ndarray],
        rng: jax.Array,
        bucket: int,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        T = bucket // width_downsample

        def body(st, sl):
            x, w_new = preprocess_batch(
                sl["the_input"],
                sl["heights"],
                sl["widths"],
                out_h=model_cfg.height,
                out_w=bucket,
                normalize=normalize,
            )
            if augment:
                x = augment_batch(
                    x,
                    jax.random.fold_in(
                        jax.random.key(augment_seed), sl["batch_index"]
                    ),
                )
            il = jnp.minimum(w_new // width_downsample, T)
            il = jnp.maximum(il - model_cfg.ctc_time_slice, 1)
            batch = {
                "x": x,
                "input_length": il.astype(jnp.int32),
                "the_labels": sl["the_labels"],
                "label_length": sl["label_length"],
            }
            return core(st, batch, rng)

        xs = {
            k: stack[k]
            for k in (
                "the_input", "heights", "widths",
                "the_labels", "label_length", "batch_index",
            )
        }
        return jax.lax.scan(body, state, xs)

    return jax.jit(
        multi_step,
        static_argnames=("bucket",),
        donate_argnums=(0,) if donate else (),
    )


def make_cached_multi_train_step(
    model_cfg: ModelConfig,
    exact_keras: bool = False,
    donate: bool = True,
    use_pallas_ctc: "bool | None" = None,
    mesh=None,
    pallas_interpret: bool = False,
    width_downsample: int = 4,
    normalize: bool = True,
    augment: bool = False,
    augment_seed: int = 0,
    unroll: int = 1,
):
    """K train steps per dispatch over a DEVICE-RESIDENT corpus
    (``data.device_cache.DeviceResidentCorpus``).

    ``cached_step(state, pixels, widths, labels, lab_len, rows,
    batch_index, rng, bucket=W)``: ``pixels (N, H, W) uint8`` / ``widths``/
    ``labels``/``lab_len`` are the corpus tables already living in HBM
    (passed as jit args — zero transfer, never baked into the executable);
    ``rows (K, B) int32`` + ``batch_index (K,)`` are the ONLY per-call
    host->device bytes (~0.5 KB for K=1). Each scan step gathers its batch
    from HBM, runs the fused preprocess (stored rows are already
    height-normalized + white-padded, so the resize is an identity pass
    with the same numerics as the host path), optional augmentation, and
    the train step. Under a ``mesh`` the gathered batch is explicitly
    constrained to 'data'-sharding so DP behaves exactly like the streamed
    path."""
    if use_pallas_ctc is None:
        use_pallas_ctc = jax.default_backend() in ("tpu", "axon")
    core = _train_step_fn(
        model_cfg, exact_keras, use_pallas_ctc, mesh, pallas_interpret
    )
    from crnn_ocr_tpu.ops.preprocess import preprocess_resident

    if augment:
        from crnn_ocr_tpu.ops.augment import augment_batch

    def cached_step(
        state: TrainState,
        pixels: jnp.ndarray,
        widths: jnp.ndarray,
        labels: jnp.ndarray,
        lab_len: jnp.ndarray,
        rows: jnp.ndarray,
        batch_index: jnp.ndarray,
        rng: jax.Array,
        bucket: int,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        T = bucket // width_downsample

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def shard_b(a):  # batch axis over 'data', rest replicated
                spec = P(*(("data",) + (None,) * (a.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, spec)
                )
        else:
            def shard_b(a):
                return a

        def body(st, sl):
            r = sl["rows"]
            img = shard_b(jnp.take(pixels, r, axis=0))  # (B, H, W) gather
            w = shard_b(jnp.take(widths, r, axis=0))
            # stored rows are height-normalized + white-padded already:
            # identity-resize skipped (1-ulp-identical, see preprocess.py)
            x, w_new = preprocess_resident(img, w, normalize=normalize)
            if augment:
                x = augment_batch(
                    x,
                    jax.random.fold_in(
                        jax.random.key(augment_seed), sl["batch_index"]
                    ),
                )
            il = jnp.minimum(w_new // width_downsample, T)
            il = jnp.maximum(il - model_cfg.ctc_time_slice, 1)
            batch = {
                "x": x,
                "input_length": il.astype(jnp.int32),
                "the_labels": shard_b(jnp.take(labels, r, axis=0)),
                "label_length": shard_b(jnp.take(lab_len, r, axis=0)),
            }
            return core(st, batch, rng)

        return jax.lax.scan(
            body, state, {"rows": rows, "batch_index": batch_index},
            unroll=unroll,
        )

    return jax.jit(
        cached_step,
        static_argnames=("bucket",),
        donate_argnums=(0,) if donate else (),
    )


def make_partial_cached_multi_train_step(
    model_cfg: ModelConfig,
    exact_keras: bool = False,
    donate: bool = True,
    use_pallas_ctc: "bool | None" = None,
    mesh=None,
    pallas_interpret: bool = False,
    width_downsample: int = 4,
    normalize: bool = True,
    augment: bool = False,
    augment_seed: int = 0,
    unroll: int = 1,
):
    """K train steps per dispatch over a PARTIALLY-resident corpus
    (``DeviceResidentCorpus`` with ``partial=True`` — pixels overflow the
    HBM budget; VERDICT r4 weak #4).

    Same contract as :func:`make_cached_multi_train_step` plus two inputs:
    ``miss_pixels (M, H, W) uint8`` — the dispatch's streamed overflow
    rows — and ``pix_rows (K, B) int32`` encoding each sample's pixel
    source (``>= 0``: resident HBM row; ``< 0``: miss slot ``-(i+1)``).
    The batch assembles as a dual gather + select on device; widths/
    labels/lab_len still gather by the ORIGINAL row from the always-
    resident tables, so the batch bytes are identical to full residency
    (bitwise parity pinned by tests/test_device_cache.py)."""
    if use_pallas_ctc is None:
        use_pallas_ctc = jax.default_backend() in ("tpu", "axon")
    core = _train_step_fn(
        model_cfg, exact_keras, use_pallas_ctc, mesh, pallas_interpret
    )
    from crnn_ocr_tpu.ops.preprocess import preprocess_resident

    if augment:
        from crnn_ocr_tpu.ops.augment import augment_batch

    def cached_step(
        state: TrainState,
        pixels: jnp.ndarray,
        widths: jnp.ndarray,
        labels: jnp.ndarray,
        lab_len: jnp.ndarray,
        miss_pixels: jnp.ndarray,
        rows: jnp.ndarray,
        pix_rows: jnp.ndarray,
        batch_index: jnp.ndarray,
        rng: jax.Array,
        bucket: int,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        T = bucket // width_downsample

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def shard_b(a):
                spec = P(*(("data",) + (None,) * (a.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, spec)
                )
        else:
            def shard_b(a):
                return a

        def body(st, sl):
            r = sl["rows"]
            pr = sl["pix_rows"]
            is_miss = pr < 0
            img = jnp.where(
                is_miss[:, None, None],
                jnp.take(miss_pixels, jnp.where(is_miss, -pr - 1, 0), axis=0),
                jnp.take(pixels, jnp.where(is_miss, 0, pr), axis=0),
            )
            img = shard_b(img)
            w = shard_b(jnp.take(widths, r, axis=0))
            x, w_new = preprocess_resident(img, w, normalize=normalize)
            if augment:
                x = augment_batch(
                    x,
                    jax.random.fold_in(
                        jax.random.key(augment_seed), sl["batch_index"]
                    ),
                )
            il = jnp.minimum(w_new // width_downsample, T)
            il = jnp.maximum(il - model_cfg.ctc_time_slice, 1)
            batch = {
                "x": x,
                "input_length": il.astype(jnp.int32),
                "the_labels": shard_b(jnp.take(labels, r, axis=0)),
                "label_length": shard_b(jnp.take(lab_len, r, axis=0)),
            }
            return core(st, batch, rng)

        return jax.lax.scan(
            body,
            state,
            {
                "rows": rows,
                "pix_rows": pix_rows,
                "batch_index": batch_index,
            },
            unroll=unroll,
        )

    return jax.jit(
        cached_step,
        static_argnames=("bucket",),
        donate_argnums=(0,) if donate else (),
    )


def optax_global_norm(tree: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model_cfg: ModelConfig):
    """Jitted ``eval_step(state, batch) -> (loss_vec, decoded, logits)``:
    inference-mode forward + greedy decode (the per-epoch validation the
    reference prints via edit distance, C9)."""

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["x"][..., None],
            train=False,
        )
        loss_vec = ctc_loss_vec(
            logits,
            batch["the_labels"],
            batch["input_length"],
            batch["label_length"],
            ctc_time_slice=model_cfg.ctc_time_slice,
            exact_keras=False,
        )
        probs = jax.nn.softmax(logits[:, model_cfg.ctc_time_slice :, :], -1)
        decoded, _ = ctc.ctc_greedy_decode(probs, batch["input_length"])
        return loss_vec, decoded

    return jax.jit(eval_step)
