"""Training orchestration: the fit loop (reference L3, train.py).

Replaces Keras ``fit_generator`` + callbacks (ModelCheckpoint/EarlyStopping,
SURVEY.md C10) with an explicit loop: prefetched device batches ->
jitted SPMD train step -> periodic greedy-decode validation (CER/WER) ->
orbax checkpointing of the best/latest full train state -> JSONL metrics.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from crnn_ocr_tpu.data.codec import LabelCodec
from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.ops import ctc
from crnn_ocr_tpu.train import step as step_lib
from crnn_ocr_tpu.train.checkpoint import CheckpointManager
from crnn_ocr_tpu.train.state import TrainState
from crnn_ocr_tpu.utils import metrics as metrics_lib


@dataclasses.dataclass
class FitConfig:
    steps: int = 1000  # TOTAL step budget (resume continues toward it)
    eval_every: int = 200
    eval_batches: int = 8
    checkpoint_dir: Optional[str] = None
    early_stop_patience: int = 0  # 0 = off; counts evals without improvement
    log_every: int = 50
    metrics_path: Optional[str] = None  # JSONL stream
    seed: int = 0
    exact_keras_loss: bool = False
    mesh: object = None  # optional jax.sharding.Mesh for DP
    tensorboard_dir: Optional[str] = None  # SURVEY.md §5.5 observability
    profile_dir: Optional[str] = None  # xplane trace dir (SURVEY.md §5.1)
    profile_at: int = 5  # trace starts this many steps in (skip compiles)
    profile_steps: int = 20  # steps captured in the trace
    on_device_cer: bool = False  # batched Levenshtein DP on the accelerator
    # K optimizer steps per device dispatch (train.step.make_multi_train_step):
    # amortizes per-dispatch host/tunnel overhead — the measured e2e input
    # gap (benchmarks/input_gap_profile.json). >1 changes the train_iter
    # contract to RAW host batches via data.pipeline.stack_host_batches;
    # device math is identical to K single steps (tests/test_train_multi.py).
    steps_per_call: int = 1
    normalize: bool = True  # multi-step path: preprocess normalization
    augment: bool = False  # multi-step path: on-device augmentation
    augment_seed: int = 0
    # Device-resident corpus (data.device_cache.DeviceResidentCorpus):
    # train_iter then yields (K, B) row-index stacks and the step gathers
    # pixels from HBM — no per-step pixel upload at all.
    device_corpus: object = None


def fit(
    state: TrainState,
    model_cfg: ModelConfig,
    train_iter: Iterator[Dict],
    eval_iter_fn: Optional[Callable[[], Iterator[Dict]]] = None,
    codec: Optional[LabelCodec] = None,
    cfg: FitConfig = FitConfig(),
) -> TrainState:
    train_step = step_lib.make_train_step(
        model_cfg, exact_keras=cfg.exact_keras_loss, mesh=cfg.mesh
    )
    multi_step = (
        step_lib.make_multi_train_step(
            model_cfg,
            exact_keras=cfg.exact_keras_loss,
            mesh=cfg.mesh,
            width_downsample=model_cfg.width_downsample,
            normalize=cfg.normalize,
            augment=cfg.augment,
            augment_seed=cfg.augment_seed,
        )
        if cfg.steps_per_call > 1
        else None
    )
    cached_step = (
        step_lib.make_cached_multi_train_step(
            model_cfg,
            exact_keras=cfg.exact_keras_loss,
            mesh=cfg.mesh,
            width_downsample=model_cfg.width_downsample,
            normalize=cfg.normalize,
            augment=cfg.augment,
            augment_seed=cfg.augment_seed,
        )
        if cfg.device_corpus is not None
        else None
    )
    partial_cached_step = (
        step_lib.make_partial_cached_multi_train_step(
            model_cfg,
            exact_keras=cfg.exact_keras_loss,
            mesh=cfg.mesh,
            width_downsample=model_cfg.width_downsample,
            normalize=cfg.normalize,
            augment=cfg.augment,
            augment_seed=cfg.augment_seed,
        )
        if cfg.device_corpus is not None
        and getattr(cfg.device_corpus, "partial", False)
        else None
    )
    eval_step = step_lib.make_eval_step(model_cfg)
    rng = jax.random.key(cfg.seed)

    ckpt = (
        CheckpointManager(cfg.checkpoint_dir, track_metric="cer")
        if cfg.checkpoint_dir
        else None
    )
    mfile = open(cfg.metrics_path, "a") if cfg.metrics_path else None
    tb = None
    if cfg.tensorboard_dir:
        try:
            from tensorboardX import SummaryWriter

            tb = SummaryWriter(cfg.tensorboard_dir)
        except Exception:
            tb = None

    if cfg.mesh is not None:
        from crnn_ocr_tpu.parallel import mesh as mesh_lib

        state = mesh_lib.replicate_state(state, cfg.mesh)

    best_cer = float("inf")
    evals_since_improve = 0
    t_start = time.time()
    ema_loss = None
    lines_seen = 0
    start_step = int(state.step)  # resume: cfg.steps is a TOTAL budget
    from crnn_ocr_tpu.utils.profiling import StepTimer, xplane_trace

    timer = StepTimer(window=cfg.log_every)
    profiler_ctx = None  # active xplane_trace context, if any

    def log(rec: dict):
        if mfile:
            mfile.write(json.dumps(rec) + "\n")
            mfile.flush()
        if tb is not None:
            step = rec.get("step", 0)
            prefix = rec.get("kind", "train")
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k != "step":
                    tb.add_scalar(f"{prefix}/{k}", v, step)

    pending_logs: list = []

    # One fused device program slicing every metric's last inner step —
    # NOT per-key getitems (each a separate tunnel dispatch; see the log
    # branch below). Compiles once per metrics tree structure.
    _slice_last = jax.jit(
        lambda tree: jax.tree_util.tree_map(lambda v: v[-1], tree)
    )

    def emit_log(entry):
        nonlocal ema_loss
        e_step, e_lines, e_dt, e_m, e_timer = entry
        loss = float(e_m["loss"])
        ema_loss = loss if ema_loss is None else 0.9 * ema_loss + 0.1 * loss
        rec = {
            "step": e_step,
            "loss": loss,
            "ema_loss": ema_loss,
            "grad_norm": float(e_m["grad_norm"]),
            "lines_per_sec": e_lines / e_dt,
            "wall": e_dt,
            **{f"host_step_{k}": v for k, v in e_timer.items()},
        }
        print(
            f"step {e_step:6d} loss {loss:9.4f} ema {ema_loss:9.4f} "
            f"gnorm {rec['grad_norm']:8.3f} "
            f"{rec['lines_per_sec']:8.1f} lines/s",
            file=sys.stderr,
        )
        log({"kind": "train", **rec})

    gstep = start_step
    for i, batch in enumerate(train_iter):
        stacked_k = (
            int(batch["stacked"])
            if isinstance(batch, dict) and "stacked" in batch
            else 0
        )
        k_steps = stacked_k or 1
        remaining = cfg.steps - gstep
        if remaining <= 0:
            break
        if k_steps > remaining:
            if not stacked_k:
                break  # single-step path drains exactly
            # trim the stack to the remaining budget so cfg.steps is always
            # reachable (otherwise a K∤steps run stops short and --resume
            # can never progress); costs one tail-shape compile
            k_steps = remaining
            batch = dict(batch)
            batch["stacked"] = k_steps
            for key in ("the_input", "heights", "widths", "the_labels",
                        "label_length", "batch_index", "rows", "pix_rows"):
                if key in batch and hasattr(batch[key], "shape"):
                    batch[key] = batch[key][:k_steps]
        prev_gstep, gstep = gstep, gstep + k_steps

        if cfg.profile_dir and i == cfg.profile_at:
            profiler_ctx = xplane_trace(cfg.profile_dir)
            profiler_ctx.__enter__()

        if stacked_k and batch.get("device_cached"):
            texts = None
            bucket = int(batch["bucket"])
            rows = batch["rows"]  # (K, B) int32 — the only per-call bytes
            n_lines = int(rows.shape[0]) * int(rows.shape[1])
            if cfg.mesh is not None and rows.shape[1] % cfg.mesh.size:
                raise ValueError(
                    f"device_cache under a mesh needs batch_size divisible "
                    f"by the mesh ({rows.shape[1]} % {cfg.mesh.size})"
                )
            arrs = cfg.device_corpus.arrays(bucket)
            with timer:
                if "miss_pixels" in batch:
                    # partial residency: overflow pixels stream with the
                    # dispatch; everything else gathers from HBM
                    state, ms = partial_cached_step(
                        state,
                        arrs["pixels"], arrs["widths"],
                        arrs["labels"], arrs["lab_len"],
                        batch["miss_pixels"],
                        rows, batch["pix_rows"],
                        batch["batch_index"], rng,
                        bucket=bucket,
                    )
                else:
                    state, ms = cached_step(
                        state,
                        arrs["pixels"], arrs["widths"],
                        arrs["labels"], arrs["lab_len"],
                        rows, batch["batch_index"], rng,
                        bucket=bucket,
                    )
            m = None  # last inner step's metrics, sliced lazily (below)
        elif stacked_k:
            texts = batch.pop("texts", None)
            bucket = int(batch.pop("bucket"))
            batch.pop("stacked")
            n_lines = k_steps * int(batch["the_labels"].shape[1])
            if cfg.mesh is not None:
                from crnn_ocr_tpu.parallel import mesh as mesh_lib

                B = int(batch["the_labels"].shape[1])
                if B % cfg.mesh.size:
                    raise ValueError(
                        f"steps_per_call > 1 under a mesh needs batch_size "
                        f"divisible by the mesh ({B} % {cfg.mesh.size}); "
                        f"use steps_per_call=1 for ragged DP batches"
                    )
                batch = mesh_lib.shard_stacked_batch(batch, cfg.mesh)
            with timer:
                state, ms = multi_step(state, batch, rng, bucket=bucket)
            m = None  # last inner step's metrics, sliced lazily (below)
        else:
            if multi_step is not None and "x" not in batch:
                # partial group flushed by stack_host_batches (bounded
                # streams only): produce + single-step it
                from crnn_ocr_tpu.data.pipeline import produce_batch

                batch = produce_batch(
                    batch,
                    width_downsample=model_cfg.width_downsample,
                    normalize=cfg.normalize,
                    augment=cfg.augment,
                    augment_seed=cfg.augment_seed,
                    index=int(batch.pop("batch_index", 0)),
                    ctc_time_slice=model_cfg.ctc_time_slice,
                    out_h=model_cfg.height,
                )
            texts = batch.pop("texts", None)
            batch.pop("bucket", None)
            n_lines = int(batch["x"].shape[0])
            if cfg.mesh is not None:
                from crnn_ocr_tpu.parallel import mesh as mesh_lib

                n_dev = cfg.mesh.size
                if n_lines % n_dev:
                    batch = mesh_lib.pad_batch_to(
                        batch, -(-n_lines // n_dev) * n_dev
                    )
                batch = mesh_lib.shard_batch(batch, cfg.mesh)
            with timer:
                state, m = train_step(state, batch, rng)
            ms = None
        if m is None and (
            profiler_ctx is not None
            or (gstep // cfg.log_every) > (prev_gstep // cfg.log_every)
            or i == 0
        ):
            # Slice the last inner step's metrics ONLY when something will
            # read them, and in ONE jitted call: per-key v[-1] getitems
            # were each their own tunnel dispatch (~tens of ms), which at
            # K-step cadence cost more than the whole device step on every
            # logging iteration (100k corpus e2e measured 26.7k lines/s at
            # log_every<=K vs 35.6k with sparse logging).
            m = _slice_last(ms)
        if profiler_ctx is not None and i == cfg.profile_at + cfg.profile_steps:
            float(m["loss"])  # materialize: flush device work into the trace
            profiler_ctx.__exit__(None, None, None)
            profiler_ctx = None
            print(f"profile trace written to {cfg.profile_dir}",
                  file=sys.stderr)
        lines_seen += n_lines

        if (gstep // cfg.log_every) > (prev_gstep // cfg.log_every) or i == 0:
            # LAGGED async logging: materializing a device scalar here is a
            # full sync round-trip (~74 ms on this tunnel — it was costing
            # 3 ms/step, HALF the e2e step time, at K=16/log_every=25). So:
            # start an async device->host copy now, and print the PREVIOUS
            # log point, whose transfer has had a whole log period in
            # flight. i == 0 flushes immediately (post-compile signal).
            for v in m.values():
                if hasattr(v, "copy_to_host_async"):
                    v.copy_to_host_async()
            pending_logs.append(
                (gstep, lines_seen, time.time() - t_start, m, timer.stats())
            )
            while len(pending_logs) > (0 if i == 0 else 1):
                emit_log(pending_logs.pop(0))

        if eval_iter_fn and (
            (gstep // cfg.eval_every) > (prev_gstep // cfg.eval_every)
        ):
            while pending_logs:  # keep the JSONL ordered; eval syncs anyway
                emit_log(pending_logs.pop(0))
            ev = evaluate(
                state, eval_step, eval_iter_fn(), codec, cfg.eval_batches,
                mesh=cfg.mesh, on_device_cer=cfg.on_device_cer,
            )
            ev["step"] = gstep
            print(
                f"eval  step {gstep}: loss {ev['loss']:.4f} CER {ev['cer']:.4f} "
                f"WER {ev['wer']:.4f} acc {ev['seq_acc']:.4f}",
                file=sys.stderr,
            )
            log({"kind": "eval", **ev})
            if ckpt:
                ckpt.save(gstep, state, model_cfg, codec, metrics=ev)
            if ev["cer"] < best_cer - 1e-6:
                best_cer = ev["cer"]
                evals_since_improve = 0
            else:
                evals_since_improve += 1
                if (
                    cfg.early_stop_patience
                    and evals_since_improve >= cfg.early_stop_patience
                ):
                    print("early stopping", file=sys.stderr)
                    break

    while pending_logs:  # flush the lagged tail
        emit_log(pending_logs.pop(0))
    if profiler_ctx is not None:  # loop ended inside the trace window
        profiler_ctx.__exit__(None, None, None)
    if ckpt:
        ckpt.save(int(state.step), state, model_cfg, codec)
        ckpt.wait()
    if mfile:
        mfile.close()
    if tb is not None:
        tb.close()
    return state


def evaluate(
    state: TrainState,
    eval_step,
    eval_iter: Iterator[Dict],
    codec: Optional[LabelCodec],
    max_batches: int = 8,
    mesh=None,
    on_device_cer: bool = False,
) -> Dict[str, float]:
    """Validation pass: loss + greedy-decode CER/WER/seq-acc.

    ``on_device_cer=True`` computes CER with the batched Levenshtein DP on
    the accelerator (``ops.editdistance``) instead of host text edit
    distance — same value (label<->char map is a bijection), no per-line
    host decode; it is also the automatic fallback when no codec/texts are
    available (label-space CER instead of the old NaN)."""
    losses, preds, refs = [], [], []
    dist_sum = 0
    ref_len_sum = 0
    device_batches = 0
    device_cer_ok = True
    for j, batch in enumerate(eval_iter):
        if j >= max_batches:
            break
        texts = batch.pop("texts", None)
        batch.pop("bucket", None)
        n_lines = next(
            v.shape[0] for v in batch.values() if hasattr(v, "shape")
        )
        if mesh is not None:
            from crnn_ocr_tpu.parallel import mesh as mesh_lib

            if n_lines % mesh.size:
                batch = mesh_lib.pad_batch_to(
                    batch, -(-n_lines // mesh.size) * mesh.size
                )
            batch.pop("valid_mask", None)  # eval slices on the host instead
            batch = mesh_lib.shard_batch(batch, mesh)
        loss_vec, decoded = eval_step(state, batch)
        losses.append(np.asarray(loss_vec)[:n_lines])
        want_device_cer = on_device_cer or texts is None or codec is None
        if want_device_cer and "the_labels" in batch:
            from crnn_ocr_tpu.ops import editdistance as ed

            dec_len = (np.asarray(decoded) >= 0).sum(axis=1)
            d = np.asarray(
                ed.batched_levenshtein(
                    decoded,
                    dec_len,
                    batch["the_labels"],
                    batch["label_length"],
                )
            )[:n_lines]
            ref_l = np.asarray(batch["label_length"]).reshape(-1)[:n_lines]
            dist_sum += int(d.sum())
            ref_len_sum += int(ref_l.sum())
            device_batches += 1
        else:
            device_cer_ok = False
        if codec is not None and texts is not None:
            rows = ctc.trim_dense(decoded)[:n_lines]
            for row, ref in zip(rows, texts):
                preds.append(codec.labels_to_text(row))
                refs.append(ref)
    out = {"loss": float(np.mean(np.concatenate(losses)))}
    if refs:
        out["wer"] = metrics_lib.wer(preds, refs)
        out["seq_acc"] = metrics_lib.sequence_accuracy(preds, refs)
        out["cer"] = (
            dist_sum / max(ref_len_sum, 1)
            if (on_device_cer and device_cer_ok)
            else metrics_lib.cer(preds, refs)
        )
    elif device_cer_ok and device_batches > 0:
        out["cer"] = dist_sum / max(ref_len_sum, 1)
        out.update({"wer": float("nan"), "seq_acc": float("nan")})
    else:
        out.update({"cer": float("nan"), "wer": float("nan"), "seq_acc": float("nan")})
    return out
