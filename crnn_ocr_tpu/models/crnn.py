"""CRNN text-line recognizer, flax/linen, NHWC, TPU-first.

TPU-native re-design of the reference's ``utils.py#CRNN`` builder
(SURVEY.md C4): depthwise-separable conv backbone -> collapse height ->
time-distributed dense -> stacked bidirectional GRU/LSTM -> class logits.
Differences from the reference are deliberate TPU choices, not omissions:

  * NHWC layout + bfloat16-ready compute path (MXU tiling).
  * Depthwise convs via ``feature_group_count`` (XLA-native on TPU, C14).
  * The recurrence is the batched two-direction scan in models/rnn.py (C16).
  * The CTC head is NOT part of the model graph: Keras needed an in-graph
    ``Lambda(ctc_lambda_func)`` + dummy loss (C6) because of fit()'s API; in
    JAX the loss lives in the train step (crnn_ocr_tpu.train.step), and the
    model exposes logits. The reference's ``[:, 2:, :]`` warm-up-frame slice
    (C6) is applied by the train step via ``ModelConfig.ctc_time_slice``.

The inference graph ends at softmax probabilities exactly like the
reference's prediction model; decoding is crnn_ocr_tpu.ops.ctc.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from crnn_ocr_tpu.models.rnn import BiRNN
from crnn_ocr_tpu.models.stn import STN


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters mirroring the reference CRNN's constructor knobs
    (SURVEY.md C10: --n_units, --time_dense_size, GRU/LSTM choice, STN
    toggle) plus layout knobs."""

    num_classes: int = 80  # excluding blank; logits dim = num_classes + 1
    height: int = 32
    width: int = 128  # default bucket width
    stem_filters: int = 64
    block_filters: Sequence[int] = (128, 256, 256, 512)
    # (pool_h, pool_w) per block; stem pools (2, 2). Height must collapse
    # to 1: 32 / (2*2*2*2*2) with widths 2*2 -> T = width / 4.
    block_pools: Sequence[Tuple[int, int]] = ((2, 2), (2, 1), (2, 1), (2, 1))
    time_dense_size: int = 128
    n_units: int = 256
    rnn_layers: int = 2
    rnn_cell: str = "gru"  # "gru" | "lstm"
    dropout_rate: float = 0.2
    use_stn: bool = False
    # Frames dropped from the head of the CTC alignment (reference C6's
    # y_pred[:, 2:, :] "early conv outputs are garbage" trick).
    ctc_time_slice: int = 2
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16"
    # Fused Pallas recurrence for GRU/LSTM layers (kernels/bigru.py); shapes
    # must be MXU-aligned (units % 128 == 0, batch % 8 == 0) or it falls
    # back. None = auto: on for TPU backends when mesh-free (resolved by
    # resolve_runtime_flags at model-build time). This is a runtime knob,
    # not architecture — params are identical either way.
    use_pallas_rnn: "bool | None" = None
    # Fused Pallas stem (kernels/fused_stem.py serve kernel; train-mode
    # fwd+bwd pair in kernels/fused_stem_train.py): conv+BN+ReLU+pool
    # without materializing the full-res activation in HBM. None = auto:
    # on for TPU backends at B>=128, W<=128 (shape-profiled; serve
    # additionally requires bf16 compute, train additionally non-STN).
    # Runtime knob — params are identical either way.
    use_fused_stem: "bool | None" = None
    # Model provenance: "native" (trained by this framework) or
    # "keras_migrated" (imported reference .h5 artifact). Keys the DEFAULT
    # beam extraction semantics in the Predictor: migrated models keep
    # K.ctc_decode parity (TF-V1 merge_repeated=True, which collapses
    # double letters); native models default to standard CTC
    # (merge_repeated=False) — the V1 merge measurably corrupts accuracy
    # on own-trained models (fonts-hard: WER 0.348 vs 0.166,
    # benchmarks/beam_value_eval_fonts_hard.json). An explicit
    # merge_repeated argument always overrides.
    provenance: str = "native"

    @property
    def logits_dim(self) -> int:
        return self.num_classes + 1

    @property
    def blank_index(self) -> int:
        return self.num_classes  # last class, Keras convention

    @property
    def width_downsample(self) -> int:
        d = 2  # stem pool
        for _, pw in self.block_pools:
            d *= pw
        return d

    def time_steps(self, width: int | None = None) -> int:
        return (width or self.width) // self.width_downsample


_stem_path_logged: set = set()


def _log_stem_path(train: bool, shape, on: bool) -> None:
    """Once-per-(mode, shape, decision) kernel-path note, mirroring the
    rnn/ctc path logs — runs at trace time (the gate is static)."""
    import sys as _sys

    key = (train, tuple(shape), on)
    if key in _stem_path_logged:
        return
    _stem_path_logged.add(key)
    mode = "train" if train else "serve"
    path = "pallas fused" if on else "xla"
    print(
        f"[crnn_ocr_tpu] stem path ({mode}, B={shape[0]}, W={shape[2]}): "
        f"{path}",
        file=_sys.stderr,
    )


class DepthwiseSeparableBlock(nn.Module):
    """DepthwiseConv3x3 + pointwise 1x1 + BN + ReLU + pool + dropout (C14)."""

    filters: int
    pool: Tuple[int, int]
    dropout_rate: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (3, 3),
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.filters,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="pointwise",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype,
            epsilon=1e-3, momentum=0.99,  # Keras BN defaults (parity)
        )(x, mask=bn_mask)
        x = nn.relu(x)
        if self.pool != (1, 1):
            # nn.max_pool's select-and-scatter backward was profiled against
            # a strided-slice + dilated-pad custom VJP AND a window-reshape
            # variant (r2 trace): the pads alone cost ~2.4 ms/step at B=128
            # (4 unfused full-res writes) vs 0.85 ms for select-and-scatter
            # across ALL pools. XLA's native lowering won; keep it.
            x = nn.max_pool(x, self.pool, strides=self.pool)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class _StemBNState(nn.Module):
    """Declares nn.BatchNorm's exact param/state tree (params scale/bias,
    batch_stats mean/var — same names, shapes, inits) WITHOUT computing
    normalization: the fused stem kernels do that math. First call returns
    the current values; a second call with batch statistics applies the
    running-stat momentum update (identical to flax BatchNorm's)."""

    features: int
    momentum: float = 0.99

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (self.features,),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (self.features,),
        )
        if batch_mean is not None and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1 - m) * batch_var
        return scale, bias, ra_mean.value, ra_var.value


class CRNN(nn.Module):
    """The flagship model: images (B, H, W, 1) -> logits (B, T, C+1)."""

    cfg: ModelConfig
    # GSPMD mesh when training data-parallel: lets the Pallas RNN cells run
    # per shard via shard_map instead of falling back to the XLA scan.
    mesh: object = None
    # Run Pallas kernels in interpreter mode (CPU-mesh tests only).
    pallas_interpret: bool = False

    def _fused_stem_active(self, x, train: bool) -> bool:
        """Fused stem gate (kernels/fused_stem.py serve kernel; in train
        mode kernels/fused_stem_train.py): explicit True wins (tests use
        it with pallas_interpret); auto (None) needs a TPU backend and a
        supported shape. The train path additionally requires a non-STN
        config: the train kernels return d_img = 0, valid only when the
        image is a gradient leaf. Serving auto-on requires bf16 (the
        kernel's conv operands are bf16 there); training runs either dtype
        (f32 uses Precision.HIGHEST matmuls)."""
        on = self._fused_stem_decision(x, train)
        _log_stem_path(train, x.shape, on)
        return on

    def _fused_stem_decision(self, x, train: bool) -> bool:
        from crnn_ocr_tpu.kernels.fused_stem import (
            fused_stem_default,
            stem_supported,
        )

        cfg = self.cfg
        if cfg.use_fused_stem is False or not stem_supported(x.shape):
            return False
        if train and cfg.use_stn:
            return False
        if cfg.use_fused_stem:
            return True
        if not train and cfg.dtype != "bfloat16":
            return False
        # Auto gate is shape-profiled (idle-chip A/B, serve bf16): the
        # kernel wins at b256/w128 (0.97 -> 0.88 ms) but loses at small
        # batch (b32: 0.13 -> 0.23 ms — 4 near-empty programs) and wide
        # buckets (w256: 2.11 -> 2.24 ms). Explicit True overrides.
        B, _, W, _ = x.shape
        if B < 128 or W > 128:
            return False
        return fused_stem_default() and (
            self.mesh is not None or jax.device_count() == 1
        )

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, valid_mask=None
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        x = x.astype(dtype)
        if x.ndim == 3:
            x = x[..., None]

        # DP divisibility padding (parallel.mesh.pad_batch_to): when a
        # valid_mask marks pad rows, BatchNorm batch statistics are computed
        # over VALID rows only (flax's masked moments), so padded all-zero
        # images cannot perturb the normalization of real samples — the
        # padded step is exactly the unpadded step (SURVEY.md §2.3 DP
        # correctness; asserted incl. batch_stats by
        # tests/test_parallel.py::test_padded_batch_step_matches_unpadded).
        # In eval (use_running_average=True) the mask is irrelevant.
        bn_mask4 = bn_mask3 = None
        if valid_mask is not None and train:
            vm = valid_mask.reshape(-1).astype(bool)
            bn_mask4 = vm[:, None, None, None]
            bn_mask3 = vm[:, None, None]

        if cfg.use_stn:
            x = STN(
                dtype=dtype, mesh=self.mesh,
                pallas_interpret=self.pallas_interpret, name="stn",
            )(x, train=train)

        # Stem. (An im2col-einsum weight-grad rewrite was tried and reverted:
        # XLA lowered the Cin=1 contraction to the same multiply-reduce plus
        # a 600 MB tap materialization — no MXU routing, pure overhead.)
        stem_conv = nn.Conv(
            cfg.stem_filters, (3, 3), padding="SAME", use_bias=False,
            dtype=dtype, name="stem_conv",
        )

        def make_bn():  # constructing a named module claims the name,
            return nn.BatchNorm(  # so only the branch that uses it may
                use_running_average=not train, dtype=dtype,  # build it
                name="stem_bn", epsilon=1e-3, momentum=0.99,
            )

        # The fused stem kernels compute BN batch stats over ALL rows; with
        # a pad mask present the masked-moments path below must own the
        # stats, so the kernel is bypassed (pad only occurs on ragged final
        # batches — a static, rare fallback).
        fused_ok = bn_mask4 is None and self._fused_stem_active(x, train)
        if fused_ok and train:
            from crnn_ocr_tpu.kernels.fused_stem_train import (
                fused_stem_train_dispatch,
            )

            # The conv dummy call creates the identical "stem_conv" param;
            # its result is DCE'd. _StemBNState owns "stem_bn" (same tree
            # as nn.BatchNorm) and applies the running-stat update below.
            _ = stem_conv(jnp.zeros((1, 3, 3, 1), dtype))
            bn_state = _StemBNState(cfg.stem_filters, name="stem_bn")
            scale, bias, _, _ = bn_state()
            x, b_mean, b_var = fused_stem_train_dispatch(
                x, stem_conv.variables["params"]["kernel"], scale, bias,
                eps=1e-3, bf16=cfg.dtype == "bfloat16",
                mesh=self.mesh, interpret=self.pallas_interpret,
            )
            bn_state(
                jax.lax.stop_gradient(b_mean),
                jax.lax.stop_gradient(b_var),
            )
        elif fused_ok:
            from crnn_ocr_tpu.kernels.fused_stem import fused_stem_dispatch

            # Dummy calls create the identical param/batch_stats tree; the
            # results are unused and DCE'd by XLA. The kernel then reads
            # the bound children's variables directly.
            _ = stem_conv(jnp.zeros((1, 3, 3, 1), dtype))
            stem_bn = make_bn()
            _ = stem_bn(jnp.zeros((1, 1, 1, cfg.stem_filters), dtype))
            x = fused_stem_dispatch(
                x,
                stem_conv.variables["params"]["kernel"],
                stem_bn.variables["params"]["scale"],
                stem_bn.variables["params"]["bias"],
                stem_bn.variables["batch_stats"]["mean"],
                stem_bn.variables["batch_stats"]["var"],
                mesh=self.mesh, interpret=self.pallas_interpret,
                out_dtype=dtype, bf16=cfg.dtype == "bfloat16",
            )
        else:
            x = stem_conv(x)
            x = make_bn()(x, mask=bn_mask4)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # Depthwise-separable backbone
        for i, (filters, pool) in enumerate(
            zip(cfg.block_filters, cfg.block_pools)
        ):
            x = DepthwiseSeparableBlock(
                filters=filters,
                pool=tuple(pool),
                dropout_rate=cfg.dropout_rate,
                dtype=dtype,
                name=f"block{i}",
            )(x, train=train, bn_mask=bn_mask4)

        # Collapse height into features: (B, H', T, C) -> (B, T, H'*C).
        B, Hp, T, C = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T, Hp * C)

        # Time-distributed bottleneck (reference's time_dense_size).
        x = nn.Dense(cfg.time_dense_size, dtype=dtype, name="time_dense")(x)
        x = nn.relu(x)

        for i in range(cfg.rnn_layers):
            x = BiRNN(
                units=cfg.n_units, cell=cfg.rnn_cell, dtype=dtype,
                use_pallas=cfg.use_pallas_rnn, mesh=self.mesh,
                pallas_interpret=self.pallas_interpret,
                name=f"birnn{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=dtype, name=f"rnn_bn{i}",
                epsilon=1e-3, momentum=0.99,
            )(x, mask=bn_mask3)

        logits = nn.Dense(
            cfg.logits_dim, dtype=jnp.float32, name="logits"
        )(x)
        return logits.astype(jnp.float32)


def build_model(cfg: ModelConfig, mesh=None) -> CRNN:
    return CRNN(cfg=cfg, mesh=mesh)


def resolve_runtime_flags(cfg: ModelConfig, n_shards: int = 1) -> ModelConfig:
    """Pin auto (None) runtime knobs to concrete values for this process.

    ``use_pallas_rnn=None`` -> True on TPU backends. Multi-device meshes
    run the fused cells per shard via shard_map (the model must be built
    with the mesh — ``build_model(cfg, mesh=...)``); per-shard batches
    that miss the kernel's shape gate fall back to the XLA scan inside
    BiRNN either way. A once-per-process note records which path compiled.
    """
    import dataclasses as _dc
    import sys as _sys

    from crnn_ocr_tpu.models.rnn import pallas_rnn_default

    if cfg.use_pallas_rnn is None:
        on = pallas_rnn_default()
        print(
            f"[crnn_ocr_tpu] rnn path: {'pallas fused cell' if on else 'xla scan'}"
            f" (backend={__import__('jax').default_backend()},"
            f" shards={n_shards}"
            f"{', via shard_map' if on and n_shards > 1 else ''})",
            file=_sys.stderr,
        )
        return _dc.replace(cfg, use_pallas_rnn=on)
    return cfg
