"""Train-mode fused Pallas stem: conv3x3 + batch-BN + ReLU + maxpool 2x2,
forward AND backward, without ever materializing the full-resolution stem
activation in HBM.

Why: the b128 f32 train-step trace (benchmarks/trace_train_summary.json)
charges ~1.5-2.0 ms of the 5.7 ms step to full-res (B, 32, 128, 64) stem
traffic — BN-normalize forward 0.40, BN backward stats 0.40, pool
select-and-scatter backward 0.41, stem weight-grad 0.36, plus the conv and
relu fusions — every one a read or write of a 134 MB tensor that exists
only between the stem conv and its 4x pooling. Recomputing the conv in
VMEM (a ~0.03 ms matmul per pass) is far cheaper than round-tripping its
output through HBM, so this module runs FOUR cheap passes over the
parity-split planes of kernels/fused_stem.py:

  fwd P1  _stats_kernel: conv in VMEM -> per-channel partial (sum, sumsq)
          (psum'd across shards under shard_map: exact sync-BN, matching
          what GSPMD gives the XLA path).
  fwd P2  the serve kernel (fused_stem.fused_stem_serve) with the batch
          stats as the BN affine -> pooled output.
  bwd P3  _bwd_partials_kernel: recompute conv -> route the pooled
          cotangent through FIRST-MAX pool semantics (XLA's
          select-and-scatter routes ties to the first window position in
          (h, w) row-major order — verified against jax.grad of
          nn.max_pool, including the all-zero relu-tie window) -> relu
          mask -> per-channel partials sum(g) and sum(g*xhat).
  bwd P4  _bwd_final_kernel: recompute conv + routing again -> full BN
          backward d_conv = c1*(g - c2 - xhat*c3) -> d_w via one
          transposed band matmul per group (folded in-kernel to the
          (3, 3, C) tap layout).

d_img is NOT produced (returned as zeros): the stem input is the
preprocessed image, a gradient leaf in every non-STN training graph, and
models/crnn.py gates this path to non-STN configs. (STN training keeps the
XLA stem, whose full-res materialization its theta gradient genuinely
needs.)

Numerics: with f32 compute the conv matmuls run at Precision.HIGHEST (the
default TPU matmul truncates operands to bf16 — measured 1e-2 pixel error
on the serve kernel); with bf16 compute they run in bf16 like the XLA
path. BN math (stats, affine, backward) is f32 throughout, like flax's
nn.BatchNorm with dtype=bfloat16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crnn_ocr_tpu.kernels.fused_stem import (
    _group_rows,
    _pick_group,
    fused_stem_serve,
)


def _planes(img):
    """(B, H, W, 1) -> width-parity planes (B, W/2, H+2) f32, h-padded."""
    xt = jnp.pad(
        jnp.transpose(img[..., 0], (0, 2, 1)).astype(jnp.float32),
        ((0, 0), (0, 0), (1, 1)),
    )
    return xt[:, 0::2, :], xt[:, 1::2, :]


def _band_weights(conv_w, H):
    """(3, 3, 1, C) conv weights -> (3*KL, GH*2C) block-banded matrix (the
    same construction as fused_stem_serve, f32)."""
    GH = _group_rows(H)
    KL = 2 * GH + 2
    C = conv_w.shape[-1]
    k3 = conv_w[:, :, 0, :].astype(jnp.float32)
    wb = jnp.zeros((3 * KL, GH * 2 * C), jnp.float32)
    for kw in range(3):
        for i in range(GH):
            for ph in range(2):
                for kh in range(3):
                    l = 2 * i + ph + kh
                    col = i * 2 * C + ph * C
                    wb = wb.at[kw * KL + l, col : col + C].add(k3[kh, kw])
    return wb


def _tap_planes(e_ref, o_ref, G, H, Wh, bf16: bool):
    GWh = G * Wh
    E = e_ref[...].reshape(GWh, H + 2)
    O = o_ref[...].reshape(GWh, H + 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (GWh, H + 2), 0) % Wh
    Om = jnp.where(row == 0, 0.0, pltpu.roll(O, 1, 0))
    Ep = jnp.where(row == Wh - 1, 0.0, pltpu.roll(E, GWh - 1, 0))
    if bf16:
        cast = lambda t: t.astype(jnp.bfloat16)  # noqa: E731
    else:
        cast = lambda t: t  # noqa: E731
    return (
        (cast(Om), cast(E), cast(O)),  # taps for even output widths
        (cast(E), cast(O), cast(Ep)),  # taps for odd output widths
    )


def _conv_group(taps, wb, lo, KL, prec):
    a = jnp.concatenate([t[:, lo : lo + KL] for t in taps], axis=1)
    return jnp.dot(
        a, wb, preferred_element_type=jnp.float32, precision=prec
    )


def _stats_kernel(e_ref, o_ref, w_ref, out_ref, *, G, H, Wh, C, bf16):
    """Per-program partial (sum, sumsq) of the conv output, per channel."""
    GH = _group_rows(H)
    KL = 2 * GH + 2
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    taps_e, taps_o = _tap_planes(e_ref, o_ref, G, H, Wh, bf16)
    wb = w_ref[...]
    s1 = jnp.zeros((1, C), jnp.float32)
    s2 = jnp.zeros((1, C), jnp.float32)
    for g in range(H // 2 // GH):
        lo = 2 * g * GH
        for taps in (taps_e, taps_o):
            z = _conv_group(taps, wb, lo, KL, prec)  # (GWh, GH*2C)
            zs = jnp.sum(z, axis=0, keepdims=True)
            zs2 = jnp.sum(z * z, axis=0, keepdims=True)
            for blk in range(2 * GH):
                s1 = s1 + zs[:, blk * C : (blk + 1) * C]
                s2 = s2 + zs2[:, blk * C : (blk + 1) * C]
    out_ref[0] = jnp.concatenate([s1, s2], axis=0)  # (2, C)


def _routed_gradients(z_e, z_o, g_blk, C, GH, scale, bias):
    """Shared P3/P4 logic for one group: affine+relu both parities, route
    the upstream pooled gradient with first-max (h,w) window order, apply
    the relu mask. Returns (d_e, d_o, xhat-free) lists per sub-row i as
    (GWh, C) blocks plus the activation blocks for xhat computation."""
    outs = []
    for i in range(GH):
        sl0 = slice(i * 2 * C, i * 2 * C + C)  # ph = 0 (even conv row)
        sl1 = slice(i * 2 * C + C, (i + 1) * 2 * C)  # ph = 1
        # window order (h, w): (0,E) (0,O) (1,E) (1,O)
        a = [
            jnp.maximum(z_e[:, sl0] * scale + bias, 0.0),
            jnp.maximum(z_o[:, sl0] * scale + bias, 0.0),
            jnp.maximum(z_e[:, sl1] * scale + bias, 0.0),
            jnp.maximum(z_o[:, sl1] * scale + bias, 0.0),
        ]
        m = jnp.maximum(jnp.maximum(a[0], a[1]), jnp.maximum(a[2], a[3]))
        g_i = g_blk[i]  # (GWh, C) f32
        taken = jnp.zeros_like(a[0], dtype=jnp.bool_)
        d = []
        for k in range(4):
            hit = (a[k] == m) & ~taken
            taken = taken | hit
            d.append(jnp.where(hit & (a[k] > 0), g_i, 0.0))
        outs.append((sl0, sl1, d))
    return outs


def _bwd_partials_kernel(
    e_ref, o_ref, w_ref, s_ref, b_ref, g_ref, out_ref,
    *, G, H, Wh, C, bf16,
):
    """Partial sum(g) and sum(g*xhat) per channel (g = cotangent w.r.t.
    the BN output, after pool routing and relu mask)."""
    GH = _group_rows(H)
    KL = 2 * GH + 2
    GWh = G * Wh
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    taps_e, taps_o = _tap_planes(e_ref, o_ref, G, H, Wh, bf16)
    wb = w_ref[...]
    sb = s_ref[...]  # (2, 2C): row0 = [mean|mean], row1 = [inv|inv]
    mean = sb[0:1, 0:C]
    inv = sb[1:2, 0:C]
    ab = b_ref[...]  # (2, 2C): row0 = [scale|scale], row1 = [bias|bias]
    scale = ab[0:1, 0:C]
    bias = ab[1:2, 0:C]
    p1 = jnp.zeros((1, C), jnp.float32)
    p2 = jnp.zeros((1, C), jnp.float32)
    for g in range(H // 2 // GH):
        lo = 2 * g * GH
        z_e = _conv_group(taps_e, wb, lo, KL, prec)
        z_o = _conv_group(taps_o, wb, lo, KL, prec)
        g_blk = [
            g_ref[:, g * GH + i].astype(jnp.float32).reshape(GWh, C)
            for i in range(GH)
        ]
        for sl0, sl1, d in _routed_gradients(
            z_e, z_o, g_blk, C, GH, scale, bias
        ):
            xh = [
                (z_e[:, sl0] - mean) * inv,
                (z_o[:, sl0] - mean) * inv,
                (z_e[:, sl1] - mean) * inv,
                (z_o[:, sl1] - mean) * inv,
            ]
            for k in range(4):
                p1 = p1 + jnp.sum(d[k], axis=0, keepdims=True)
                p2 = p2 + jnp.sum(d[k] * xh[k], axis=0, keepdims=True)
    out_ref[0] = jnp.concatenate([p1, p2], axis=0)  # (2, C)


def _bwd_final_kernel(
    e_ref, o_ref, w_ref, s_ref, b_ref, c_ref, g_ref, dw_ref,
    *, G, H, Wh, C, bf16,
):
    """d_conv = c1*(g - c2 - xhat*c3) per position; d_w via transposed
    band matmuls folded to the (16, C) tap layout (rows kh*3+kw; 9 used)."""
    GH = _group_rows(H)
    KL = 2 * GH + 2
    GWh = G * Wh
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    taps_e, taps_o = _tap_planes(e_ref, o_ref, G, H, Wh, bf16)
    wb = w_ref[...]
    sb = s_ref[...]
    mean = sb[0:1, 0:C]
    inv = sb[1:2, 0:C]
    ab = b_ref[...]
    scale = ab[0:1, 0:C]
    bias = ab[1:2, 0:C]
    cc = c_ref[...]  # (4, C): rows c1, c2, c3, zeros
    c1 = cc[0:1]
    c2 = cc[1:2]
    c3 = cc[2:3]
    # 9 per-tap (1, C) weight-grad accumulators, folded to (16, C) at the
    # end (rows kh*3+kw used; .at[]-style scatter is not Mosaic-expressible,
    # so everything is assembled with static slices and concats).
    dw9 = [jnp.zeros((1, C), jnp.float32) for _ in range(9)]
    for g in range(H // 2 // GH):
        lo = 2 * g * GH
        z_e = _conv_group(taps_e, wb, lo, KL, prec)
        z_o = _conv_group(taps_o, wb, lo, KL, prec)
        g_blk = [
            g_ref[:, g * GH + i].astype(jnp.float32).reshape(GWh, C)
            for i in range(GH)
        ]
        dce_parts = []
        dco_parts = []
        for sl0, sl1, d in _routed_gradients(
            z_e, z_o, g_blk, C, GH, scale, bias
        ):
            xh = [
                (z_e[:, sl0] - mean) * inv,
                (z_o[:, sl0] - mean) * inv,
                (z_e[:, sl1] - mean) * inv,
                (z_o[:, sl1] - mean) * inv,
            ]
            # BN backward is dense in x: c2/c3 couple every position
            # through the batch stats, independent of the pool routing.
            dc = [c1 * (d[k] - c2 - xh[k] * c3) for k in range(4)]
            dce_parts += [dc[0], dc[2]]  # ph=0 block, ph=1 block
            dco_parts += [dc[1], dc[3]]
        dce = jnp.concatenate(dce_parts, axis=1)  # (GWh, GH*2C)
        dco = jnp.concatenate(dco_parts, axis=1)
        for taps, dcb in ((taps_e, dce), (taps_o, dco)):
            a = jnp.concatenate(
                [t[:, lo : lo + KL] for t in taps], axis=1
            ).astype(jnp.float32)
            M = jax.lax.dot_general(
                a, dcb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (3KL, GH*2C)
            for kh in range(3):
                for kw in range(3):
                    t = kh * 3 + kw
                    for i in range(GH):
                        for ph in range(2):
                            l = 2 * i + ph + kh
                            col = i * 2 * C + ph * C
                            dw9[t] = dw9[t] + M[
                                kw * KL + l : kw * KL + l + 1,
                                col : col + C,
                            ]
    dw_ref[0] = jnp.concatenate(
        dw9 + [jnp.zeros((7, C), jnp.float32)], axis=0
    )


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _const_spec(shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * n, memory_space=pltpu.VMEM)


def _run_stats(E, O, wb, G, H, Wh, C, bf16, interpret):
    B = E.shape[0]
    kern = functools.partial(
        _stats_kernel, G=G, H=H, Wh=Wh, C=C, bf16=bf16
    )
    plane = pl.BlockSpec((G, Wh, H + 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[plane, plane, _const_spec(wb.shape)],
        out_specs=pl.BlockSpec((1, 2, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // G, 2, C), jnp.float32),
        interpret=interpret,
    )(E, O, wb)
    return jnp.sum(out, axis=0)  # (2, C): [sum, sumsq]


def _run_bwd_partials(E, O, wb, sb, ab, g, G, H, Wh, C, bf16, interpret):
    B = E.shape[0]
    kern = functools.partial(
        _bwd_partials_kernel, G=G, H=H, Wh=Wh, C=C, bf16=bf16
    )
    plane = pl.BlockSpec((G, Wh, H + 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            plane, plane, _const_spec(wb.shape), _const_spec((2, C)),
            _const_spec((2, C)),
            pl.BlockSpec((G, H // 2, Wh, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // G, 2, C), jnp.float32),
        interpret=interpret,
    )(E, O, wb, sb, ab, g)
    return jnp.sum(out, axis=0)  # (2, C): [sum_g, sum_g_xhat]


def _run_bwd_final(E, O, wb, sb, ab, cc, g, G, H, Wh, C, bf16, interpret):
    B = E.shape[0]
    kern = functools.partial(
        _bwd_final_kernel, G=G, H=H, Wh=Wh, C=C, bf16=bf16
    )
    plane = pl.BlockSpec((G, Wh, H + 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            plane, plane, _const_spec(wb.shape), _const_spec((2, C)),
            _const_spec((2, C)), _const_spec((4, C)),
            pl.BlockSpec((G, H // 2, Wh, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // G, 16, C), jnp.float32),
        interpret=interpret,
    )(E, O, wb, sb, ab, cc, g)
    dw16 = jnp.sum(out, axis=0)  # (16, C)
    return dw16[:9].reshape(3, 3, 1, C)  # rows kh*3+kw -> HWIO


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_stem_train(
    img, conv_w, gamma, beta,
    eps: float = 1e-3, bf16: bool = True, interpret: bool = False,
    axis_name: str | None = None,
):
    """Training-mode fused stem. Returns (pooled, batch_mean, batch_var).

    pooled = maxpool2x2(relu(BN(conv3x3(img)))) with BN batch statistics
    computed over (B, H, W) — psum'd over ``axis_name`` when set (sync-BN
    under shard_map). mean/var are for the caller's running-stat update
    and must be wrapped in stop_gradient there (their cotangents are
    ignored by the backward pass). d_img is NOT computed (zeros):
    callers gate this path to graphs where the image is a gradient leaf
    (non-STN training; models/crnn.py).
    """
    out, _ = _fwd(img, conv_w, gamma, beta, eps, bf16, interpret,
                  axis_name)
    return out


def _fwd(img, conv_w, gamma, beta, eps, bf16, interpret, axis_name):
    B, H, W, _ = img.shape
    C = conv_w.shape[-1]
    G = _pick_group(B)
    Wh = W // 2
    E, O = _planes(img)
    wb_f32 = _band_weights(conv_w, H)
    wb = wb_f32.astype(jnp.bfloat16) if bf16 else wb_f32
    s = _run_stats(E, O, wb, G, H, Wh, C, bf16, interpret)
    n = jnp.float32(B * H * W)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    mean = s[0] / n
    var = s[1] / n - mean * mean
    pooled = fused_stem_serve(
        img, conv_w, gamma, beta, mean, var,
        eps=eps, interpret=interpret,
        out_dtype=jnp.bfloat16 if bf16 else jnp.float32, bf16=bf16,
    )
    return (pooled, mean, var), (img, conv_w, gamma, beta, mean, var, n)


def _bwd(eps, bf16, interpret, axis_name, res, cts):
    img, conv_w, gamma, beta, mean, var, n = res
    g_pooled = cts[0].astype(jnp.float32)  # mean/var cotangents ignored
    B, H, W, _ = img.shape
    C = conv_w.shape[-1]
    # Backward programs hold taps + the pooled-grad block + the unrolled
    # z/xhat/dc intermediates: at G=8 (the forward's group) the compiler's
    # scoped-VMEM stack hits 21-23 MB against the 16 MB limit on v5e
    # (compile-time OOM, both dtypes; measured 2026-08-18). Half-size
    # groups fit with room; the extra grid programs are noise at stem cost.
    G = max(1, _pick_group(B) // 2)
    Wh = W // 2
    E, O = _planes(img)
    wb_f32 = _band_weights(conv_w, H)
    wb = wb_f32.astype(jnp.bfloat16) if bf16 else wb_f32
    inv = jax.lax.rsqrt(var + eps)
    sb = jnp.stack([mean, inv])  # (2, C)
    # kernels apply act = z*scale + bias with the folded BN affine:
    ab = jnp.stack([gamma.astype(jnp.float32) * inv,
                    beta.astype(jnp.float32) - mean * inv * gamma])
    p = _run_bwd_partials(E, O, wb, sb, ab, g_pooled, G, H, Wh, C, bf16,
                          interpret)
    p_tot = p
    if axis_name is not None:
        p_tot = jax.lax.psum(p, axis_name)
    d_beta = p[0]  # per-shard: shard_map transposition psums these
    d_gamma = p[1]
    c1 = gamma.astype(jnp.float32) * inv
    c2 = p_tot[0] / n
    c3 = p_tot[1] / n
    cc = jnp.stack([c1, c2, c3, jnp.zeros_like(c1)])  # (4, C)
    d_w = _run_bwd_final(E, O, wb, sb, ab, cc, g_pooled, G, H, Wh, C,
                         bf16, interpret)
    return (
        jnp.zeros_like(img),  # image is a gradient leaf (gated non-STN)
        d_w.astype(conv_w.dtype),
        d_gamma.astype(gamma.dtype),
        d_beta.astype(beta.dtype),
    )


def _fwd_vjp(img, conv_w, gamma, beta, eps, bf16, interpret, axis_name):
    return _fwd(img, conv_w, gamma, beta, eps, bf16, interpret, axis_name)


fused_stem_train.defvjp(_fwd_vjp, _bwd)


def fused_stem_train_dispatch(
    img, conv_w, gamma, beta, eps=1e-3, bf16=True,
    mesh=None, interpret=False,
):
    """fused_stem_train, per shard via shard_map on multi-device meshes
    (sync-BN via in-kernel-path psums over the mesh axis)."""
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        spec = P(axis, None, None, None)
        rep4 = P(None, None, None, None)
        rep1 = P(None)
        fn = functools.partial(
            fused_stem_train, eps=eps, bf16=bf16, interpret=interpret,
            axis_name=axis,
        )
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(spec, rep4, rep1, rep1),
            out_specs=(spec, rep1, rep1),
            check_vma=False,
        )(img, conv_w, gamma, beta)
    return fused_stem_train(img, conv_w, gamma, beta, eps, bf16, interpret,
                            None)
