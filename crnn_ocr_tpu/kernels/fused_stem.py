"""Fused Pallas serve-stem: conv3x3(1->C) + BN-affine + ReLU + maxpool 2x2.

Why (SURVEY C14, VERDICT r1 #9 "profile-gated Pallas conv block"): the
serve-step xplane trace (benchmarks/trace_serve_summary.json) showed the
XLA stem costing 0.37 ms of the 0.99 ms b256 serve step — the conv writes
its full-resolution (B, 32, 128, C) activation to HBM (134 MB bf16) only
for the next fusion to read it back and pool it 4x down. This kernel keeps
the pre-pool activation in VMEM and writes only the pooled result.
Measured standalone at the serve shape (b256, bf16): 0.31 ms vs 0.72 ms
for the XLA conv+BN+relu+pool sequence (2.3x).

Inference-only by design: serve-mode BatchNorm is a per-channel affine, so
conv+BN+ReLU+pool fuse into one per-image program. Training BN needs global
batch statistics of the pre-pool activation and keeps the XLA path (whose
full-res materialization the backward pass genuinely requires).

Kernel geometry — shaped by what Mosaic supports (probe-verified on v5e:
lane concats, tile-aligned sublane splits, positive 32-bit rolls, small-K
matmuls; NO strided slices, NO compaction gathers, NO bf16 rotate):

  * The input batch is transposed, h-padded, and split into width-parity
    planes by one cheap XLA fusion: E = x[:, 0::2, :], O = x[:, 1::2, :],
    each (B, W/2, H+2) f32 — width in sublanes, height in lanes. The
    parity split is the trick that makes 2x2 pooling expressible: the two
    width-neighbours of a pooling window live at the SAME row index of
    the two planes, so w-pooling is an elementwise max and no strided
    compaction is ever needed. (Naive in-kernel alternatives measured:
    reshape-split pair-max +0.57 ms, per-lane im2col concat +0.41 ms.)
  * Conv taps: even output widths read (w-1, w, w+1) = (roll(O), E, O);
    odd widths read (E, O, roll(E)). Only two sublane rolls total, f32
    (Mosaic's rotate is 32-bit-only), masked at image edges so images
    stacked on the sublane axis never bleed into each other.
  * The pooled-row loop (H/2 iterations) is UNROLLED so every lane index
    is static (no dynamic lane indexing on TPU). Each iteration does six
    K=4 MXU matmuls on contiguous 4-lane tap slices against (4, 2C)
    weight blocks whose two C-halves are the even/odd output rows
    (h-pooling = max of the lane halves), then maxes the two parities'
    results (w-pooling) and writes one pooled row.
  * out block is (G, H/2, W/2, C) NHWC — exactly the layout block0
    consumes; no junk columns, no post-reshape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_rows(H: int) -> int:
    """Pooled output rows per matmul group. Swept on v5e at the serve
    shape: 2 -> 0.23 ms, 4 -> 0.19, 8 -> 0.15, 16 -> 0.19 (kernel-only,
    b256): small groups are matmul-issue-bound, one huge group pays K/N
    zero-padding; 8 is the knee."""
    g = 8
    while (H // 2) % g:
        g //= 2
    return g


def _stem_kernel(e_ref, o_ref, w_ref, s_ref, b_ref, out_ref, *, G, H, W, C,
                 bf16=True):
    Wh = W // 2
    GWh = G * Wh
    GH = _group_rows(H)
    KL = 2 * GH + 2  # contiguous input lanes covering a group's tap rows
    E = e_ref[...].reshape(GWh, H + 2)  # lead-sublane merge, f32
    O = o_ref[...].reshape(GWh, H + 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (GWh, H + 2), 0) % Wh
    # even conv needs odd w-1 (invalid at w2==0); odd conv needs even w+1
    # (invalid at w2==Wh-1); rolls are per-stacked-image masked.
    Om = jnp.where(row == 0, 0.0, pltpu.roll(O, 1, 0))
    Ep = jnp.where(row == Wh - 1, 0.0, pltpu.roll(E, GWh - 1, 0))
    # bf16 operands for bf16 serving; f32 + Precision.HIGHEST otherwise
    # (the default TPU matmul truncates f32 operands to bf16).
    cast = (lambda t: t.astype(jnp.bfloat16)) if bf16 else (lambda t: t)
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    taps_e = (cast(Om), cast(E), cast(O))
    taps_o = (cast(E), cast(O), cast(Ep))
    wb = w_ref[...]  # (3*KL, GH*2C) bf16 block-banded weights
    scale = s_ref[...]  # (1, GH*2C) f32
    bias = b_ref[...]

    for g in range(H // 2 // GH):
        lo = 2 * g * GH  # first padded input lane of the group

        def conv(taps):
            a = jnp.concatenate(
                [t[:, lo : lo + KL] for t in taps], axis=1
            )  # (G*Wh, 3*KL)
            z = jnp.dot(a, wb, preferred_element_type=jnp.float32,
                        precision=prec)
            return jnp.maximum(z * scale + bias, 0.0)  # (G*Wh, GH*2C)

        ae = conv(taps_e)
        ao = conv(taps_o)
        for i in range(GH):
            sl_e = slice(i * 2 * C, i * 2 * C + C)
            sl_o = slice(i * 2 * C + C, (i + 1) * 2 * C)
            m = jnp.maximum(  # h-pool (lane halves) then w-pool (parities)
                jnp.maximum(ae[:, sl_e], ae[:, sl_o]),
                jnp.maximum(ao[:, sl_e], ao[:, sl_o]),
            )
            out_ref[:, g * GH + i] = m.astype(out_ref.dtype).reshape(
                G, Wh, C
            )


def _pick_group(B: int) -> int:
    for g in (8, 4, 2, 1):
        if B % g == 0:
            return g
    return 1


def stem_supported(img_shape: tuple) -> bool:
    """Shape gate: grayscale (B, H, W, 1), even H that fits the lane dim,
    pooled width still lane-tileable."""
    if len(img_shape) != 4:
        return False
    B, H, W, Cin = img_shape
    return (
        Cin == 1 and H % 2 == 0 and H + 2 <= 128
        and W % 2 == 0 and (W // 2) % 8 == 0 and W <= 1024
    )


@functools.partial(
    jax.jit, static_argnames=("eps", "interpret", "out_dtype", "bf16")
)
def fused_stem_serve(
    img, conv_w, bn_gamma, bn_beta, bn_mean, bn_var,
    eps: float = 1e-3, interpret: bool = False, out_dtype=jnp.bfloat16,
    bf16: bool = True,
):
    """img (B, H, W, 1) -> pooled stem activation (B, H//2, W//2, C).

    maxpool2x2(relu(BN_affine(conv3x3(img)))) with bf16 conv operands and
    f32 accumulation/affine, matching the serve-mode XLA stem
    (models/crnn.py stem_conv/stem_bn) to bf16 rounding.
    """
    B, H, W, _ = img.shape
    C = conv_w.shape[-1]
    G = _pick_group(B)

    xt = jnp.pad(
        jnp.transpose(img[..., 0], (0, 2, 1)).astype(jnp.float32),
        ((0, 0), (0, 0), (1, 1)),
    )
    E, O = xt[:, 0::2, :], xt[:, 1::2, :]  # (B, W/2, H+2) each

    # Block-banded group weights: lane l of group g is padded input row
    # 2*g*GH + l; output column block i holds pooled row g*GH+i's
    # even|odd conv rows, each needing input rows 2*i+ph+kh within the
    # group window (ph = pooled sub-row, kh = conv tap row).
    GH = _group_rows(H)
    KL = 2 * GH + 2
    k3 = conv_w[:, :, 0, :].astype(jnp.float32)  # (3, 3, C)
    wb = jnp.zeros((3 * KL, GH * 2 * C), jnp.float32)
    for kw in range(3):
        for i in range(GH):
            for ph in range(2):
                for kh in range(3):
                    l = 2 * i + ph + kh
                    col = i * 2 * C + ph * C
                    wb = wb.at[kw * KL + l, col : col + C].add(k3[kh, kw])
    wb = wb.astype(jnp.bfloat16) if bf16 else wb

    inv = bn_gamma.astype(jnp.float32) * jax.lax.rsqrt(
        bn_var.astype(jnp.float32) + eps
    )
    scale = jnp.tile(inv, 2 * GH)[None, :]
    bias = jnp.tile(
        bn_beta.astype(jnp.float32) - bn_mean.astype(jnp.float32) * inv,
        2 * GH,
    )[None, :]

    Wh = W // 2
    kernel = functools.partial(_stem_kernel, G=G, H=H, W=W, C=C,
                               bf16=bf16)
    plane_spec = pl.BlockSpec(
        (G, Wh, H + 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            plane_spec,
            plane_spec,
            pl.BlockSpec((3 * KL, GH * 2 * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GH * 2 * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GH * 2 * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G, H // 2, Wh, C), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, Wh, C), out_dtype),
        interpret=interpret,
    )(E, O, wb, scale, bias)


def fused_stem_default() -> bool:
    """Auto policy: on for TPU backends (serve kernel here; train-mode
    kernels in fused_stem_train.py share this gate via models/crnn.py)."""
    return jax.default_backend() in ("tpu", "axon")


def fused_stem_dispatch(
    img, conv_w, bn_gamma, bn_beta, bn_mean, bn_var,
    mesh=None, interpret: bool = False, out_dtype=jnp.bfloat16,
    bf16: bool = True,
):
    """fused_stem_serve, per shard via shard_map on multi-device meshes
    (batch is the only sharded axis — same dispatch as the grid sampler's
    ops.grid_sample.grid_sample_affine). ``bf16=False`` keeps the conv
    matmuls in f32 (Precision.HIGHEST) for f32 serving configs."""
    call = functools.partial(
        fused_stem_serve, interpret=interpret, out_dtype=out_dtype,
        bf16=bf16,
    )
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        spec = P(mesh.axis_names[0], None, None, None)
        rep = P(*([None] * 4))
        rep1 = P(None)
        return jax.shard_map(
            call, mesh=mesh,
            in_specs=(spec, rep, rep1, rep1, rep1, rep1),
            out_specs=spec, check_vma=False,
        )(img, conv_w, bn_gamma, bn_beta, bn_mean, bn_var)
    return call(img, conv_w, bn_gamma, bn_beta, bn_mean, bn_var)
