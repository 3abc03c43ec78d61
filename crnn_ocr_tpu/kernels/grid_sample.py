"""Pallas bilinear grid-sampler (reference C17's STN hot path, on-chip).

The XLA banded sampler (ops/grid_sample.py) is correct but HBM-bound: its
combined corner-weight einsum materializes (B, Ho, Wo, W) f32 weights —
~537 MB at the b256 serve shape — and the band-ladder ``lax.cond`` plus the
weight fusion together cost 5.7 ms of the 6.8 ms STN serve step (measured,
benchmarks/trace_stn_summary.json). This kernel keeps everything in VMEM:

  * grid=(B, chunks): one image (H, W) resident in VMEM per program, with a
    constant-in-chunk index map so Pallas loads it once per image;
  * the x-interpolation is ONE MXU matmul per chunk against a (W, CHUNK)
    two-nonzeros-per-column corner-weight matrix built on the VPU from
    iota==index masks — never written to HBM;
  * the y-interpolation is a (H, CHUNK) masked multiply + sublane reduce;
  * all mask/weight tensors are laid out lane-major over the flattened
    output chunk, so nothing needs a relayout/transpose inside the kernel.

Identical math to ops.grid_sample.bilinear_sample (corner weights from
unclipped positions, border-clamped indices): the one-hot columns sum the
two x-corners, and clamped corners collapse onto the same index exactly as
the gather path's duplicated rows do.

Training uses a custom VJP with an ANALYTIC backward kernel (three matmuls
per chunk): d_img = (g * my) @ mx^T accumulated across chunks in the output
block, and the coordinate gradients contract the corner-difference masks
(d mx / dx = (w==x1) - (w==x0)) against the image — the same values XLA
autodiff produces for the banded path (floor/clip have zero gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corner_weights(x, y, H, W, CHUNK):
    """Shared corner index/weight math: x, y are (1, CHUNK) f32 pixel
    coords; returns lane-major mask-weight matrices ((W|H), CHUNK)."""
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 0)
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, CHUNK), 0)
    ex0 = (iw == x0).astype(jnp.float32)
    ex1 = (iw == x1).astype(jnp.float32)
    ey0 = (ih == y0).astype(jnp.float32)
    ey1 = (ih == y1).astype(jnp.float32)
    mx = (1.0 - wx1) * ex0 + wx1 * ex1  # (W, CHUNK)
    my = (1.0 - wy1) * ey0 + wy1 * ey1  # (H, CHUNK)
    return mx, my, ex0, ex1, ey0, ey1


def _fwd_kernel(img_ref, x_ref, y_ref, out_ref):
    # coord/output blocks are (1, 1, CHUNK): the singleton middle dim keeps
    # Mosaic's (8, 128)-divisible block rule satisfied for flat vectors.
    img = img_ref[0].astype(jnp.float32)  # (H, W)
    H, W = img.shape
    CHUNK = x_ref.shape[2]
    mx, my, *_ = _corner_weights(x_ref[0], y_ref[0], H, W, CHUNK)
    # HIGHEST: the default TPU matmul truncates inputs to bf16, which costs
    # ~1e-2 absolute error in sampled pixels (measured on v5e); the weight
    # matmul must be exact f32 to match the XLA gather/banded paths.
    s = jnp.dot(img, mx, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (H, CHUNK)
    out_ref[0] = jnp.sum(my * s, axis=0, keepdims=True)


def _bwd_kernel(img_ref, x_ref, y_ref, g_ref, dimg_ref, dx_ref, dy_ref):
    c = pl.program_id(1)
    img = img_ref[0].astype(jnp.float32)  # (H, W)
    H, W = img.shape
    CHUNK = x_ref.shape[2]
    mx, my, ex0, ex1, ey0, ey1 = _corner_weights(
        x_ref[0], y_ref[0], H, W, CHUNK
    )
    g = g_ref[0]  # (1, CHUNK) f32
    hi = jax.lax.Precision.HIGHEST  # no bf16 truncation (see _fwd_kernel)
    s = jnp.dot(img, mx, preferred_element_type=jnp.float32,
                precision=hi)  # (H, CHUNK)
    sd = jnp.dot(img, ex1 - ex0, preferred_element_type=jnp.float32,
                 precision=hi)
    dx_ref[0] = g * jnp.sum(my * sd, axis=0, keepdims=True)
    dy_ref[0] = g * jnp.sum((ey1 - ey0) * s, axis=0, keepdims=True)
    gmy = my * g  # (H, CHUNK), broadcast over sublanes
    dimg_part = jax.lax.dot_general(
        gmy, mx, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )  # (H, W)

    @pl.when(c == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    dimg_ref[0] += dimg_part


def _pick_chunk(n4: int, W: int, bwd: bool = False) -> int:
    """Largest divisor of the flat output size within the VMEM budget.

    The forward holds ONE (W, CHUNK) corner-weight matrix; the backward
    holds THREE (mx, ex0, ex1) plus the g/my/ey blocks, so its chunk must
    be smaller — at W=256/CHUNK=4096 the compiler's scoped-VMEM stack hit
    25.8 MB against the 16 MB v5e limit (compile-time OOM; measured
    2026-08-18 training STN at bucket 256)."""
    if bwd:
        budget = 2048 if W <= 256 else 1024
    else:
        budget = 4096 if W <= 256 else 2048
    best = 1
    for d in range(1, min(n4, budget) + 1):
        if n4 % d == 0:
            best = d
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sample_pix(img, x_pix, y_pix, interpret=False):
    """img (B, H, W); x_pix/y_pix (B, N) f32 pixel coords -> (B, N) f32."""
    return _sample_pix_fwd_impl(img, x_pix, y_pix, interpret)


def _sample_pix_fwd_impl(img, x_pix, y_pix, interpret):
    B, H, W = img.shape
    N = x_pix.shape[1]
    CHUNK = _pick_chunk(N, W)
    grid = (B, N // CHUNK)
    coord_spec = pl.BlockSpec(
        (1, 1, CHUNK), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
        ],
        out_specs=coord_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        interpret=interpret,
    )(img, x_pix[:, None, :], y_pix[:, None, :])
    return out[:, 0, :]


def _sample_pix_fwd(img, x_pix, y_pix, interpret):
    out = _sample_pix_fwd_impl(img, x_pix, y_pix, interpret)
    return out, (img, x_pix, y_pix)


def _sample_pix_bwd(interpret, residuals, g):
    img, x_pix, y_pix = residuals
    B, H, W = img.shape
    N = x_pix.shape[1]
    CHUNK = _pick_chunk(N, W, bwd=True)
    grid = (B, N // CHUNK)
    coord_spec = pl.BlockSpec(
        (1, 1, CHUNK), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM
    )
    dimg, dx, dy = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
            coord_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, H, W), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        ),
        interpret=interpret,
    )(
        img, x_pix[:, None, :], y_pix[:, None, :],
        g.astype(jnp.float32)[:, None, :],
    )
    return dimg.astype(img.dtype), dx[:, 0, :], dy[:, 0, :]


_sample_pix.defvjp(_sample_pix_fwd, _sample_pix_bwd)


def sampler_supported(
    img_shape: tuple, coords_shape: tuple
) -> bool:
    """Shape gate: single channel, VMEM-resident image, lane-tileable
    flattened output (multiples of 128 keep the mask matmul efficient)."""
    B, H, W, C = img_shape
    _, Ho, Wo, _ = coords_shape
    n4 = Ho * Wo
    return (
        C == 1
        and H * W * 4 <= 256 * 1024
        and W <= 512
        and n4 % 128 == 0
        and _pick_chunk(n4, W) % 128 == 0
        and _pick_chunk(n4, W, bwd=True) % 128 == 0
    )


def bilinear_sample_pallas(
    img: jnp.ndarray, coords: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for ops.grid_sample.bilinear_sample on (B, H, W, 1) images.

    coords: (B, Ho, Wo, 2) normalized (x, y) in [-1, 1] (align_corners).
    Differentiable w.r.t. both inputs (analytic Pallas backward).
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = coords.shape
    x_pix = ((coords[..., 0] + 1.0) * ((W - 1) / 2.0)).reshape(B, Ho * Wo)
    y_pix = ((coords[..., 1] + 1.0) * ((H - 1) / 2.0)).reshape(B, Ho * Wo)
    out = _sample_pix(
        img[..., 0], x_pix.astype(jnp.float32), y_pix.astype(jnp.float32),
        interpret,
    )
    return out.reshape(B, Ho, Wo, 1).astype(img.dtype)


def pallas_sampler_default() -> bool:
    """Auto policy for the Pallas sampler: on for TPU backends."""
    return jax.default_backend() in ("tpu", "axon")
