"""Affine grid generation + bilinear sampling (STN back-end), pure XLA.

TPU-native replacement for the reference's Keras-backend spatial-transformer
sampler (SURVEY.md §2.2 C17: meshgrid + affine transform + gather + bilinear
blend, reached from utils.py's STN builder). Everything here is batched,
statically shaped, and differentiable; the gathers lower to XLA
``gather``/``take_along_axis`` which TPU handles natively.

Coordinate convention (matches the classic Keras STN samplers the reference
era used, and torch's ``align_corners=True``): normalized coords in [-1, 1]
map to pixel centers [0, size-1]; out-of-range samples clamp to the border.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_grid(theta: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Build a sampling grid from affine params.

    Args:
      theta: (B, 6) or (B, 2, 3) affine transforms in normalized coords
        (identity = [1, 0, 0, 0, 1, 0]).
      height, width: output grid size.

    Returns:
      (B, H, W, 2) sampling coordinates (x, y) in normalized [-1, 1] space.
    """
    B = theta.shape[0]
    theta = theta.reshape(B, 2, 3).astype(jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, height, dtype=jnp.float32)
    xs = jnp.linspace(-1.0, 1.0, width, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    # Broadcast arithmetic, NOT a matmul: a (2,3) contraction would hit the
    # MXU, whose default bf16 input truncation corrupts sample coordinates
    # by ~0.06 px (measured on v5e). The VPU does this exactly in f32.
    t = theta[:, :, :, None, None]  # (B, 2, 3, 1, 1)
    src_x = t[:, 0, 0] * gx + t[:, 0, 1] * gy + t[:, 0, 2]  # (B, H, W)
    src_y = t[:, 1, 0] * gx + t[:, 1, 1] * gy + t[:, 1, 2]
    return jnp.stack([src_x, src_y], axis=-1)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with border clamping, TPU-tuned.

    Layout matters enormously here: a naive per-pixel gather from the
    flattened (H*W) axis moves 4-byte slices through TPU's slow generic
    gather path (measured 43 ms for B=256 32x128 frames on v5e). Instead we
    gather whole IMAGE ROWS (contiguous 128-lane vectors — the fast gather
    path) for the two vertical corners, then select the horizontal corners
    with an iota==x lane mask folded into a multiply-reduce, which XLA fuses
    into the gather consumer (no per-element gather at all). Measured ~20x
    faster; identical math (unit-tested against map_coordinates and the STN
    identity property).

    Args:
      img: (B, H, W, C) source images.
      coords: (B, Ho, Wo, 2) normalized (x, y) sample locations in [-1, 1].

    Returns:
      (B, Ho, Wo, C) sampled output, differentiable w.r.t. both inputs.
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = coords.shape
    N = Ho * Wo

    x = (coords[..., 0] + 1.0) * (W - 1) / 2.0  # (B, Ho, Wo)
    y = (coords[..., 1] + 1.0) * (H - 1) / 2.0

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    # corner weights from unclipped positions (border clamp on indices only)
    wx1 = (x - x0f).reshape(B, N)
    wy1 = (y - y0f).reshape(B, N)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1).reshape(B, N)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1).reshape(B, N)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1).reshape(B, N)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1).reshape(B, N)

    # Row gathers: (B, N, W, C) — rows are contiguous lane vectors.
    rows0 = jnp.take_along_axis(img, y0[:, :, None, None], axis=1)
    rows1 = jnp.take_along_axis(img, y1[:, :, None, None], axis=1)

    # Horizontal corner selection as lane masks (fused, never materialized
    # as a gather).
    iota = jnp.arange(W)[None, None, :]
    m0 = (iota == x0[:, :, None])[..., None]  # (B, N, W, 1)
    m1 = (iota == x1[:, :, None])[..., None]

    v00 = jnp.sum(rows0 * m0, axis=2)  # (B, N, C)
    v01 = jnp.sum(rows0 * m1, axis=2)
    v10 = jnp.sum(rows1 * m0, axis=2)
    v11 = jnp.sum(rows1 * m1, axis=2)

    out = (
        v00 * (wy0 * wx0)[..., None]
        + v01 * (wy0 * wx1)[..., None]
        + v10 * (wy1 * wx0)[..., None]
        + v11 * (wy1 * wx1)[..., None]
    )
    return out.reshape(B, Ho, Wo, C)


BAND = 8  # max vertical sample span (rows) per output row for the fast path


def bilinear_sample_banded(
    img: jnp.ndarray, coords: jnp.ndarray, band: int = BAND
) -> jnp.ndarray:
    """Banded bilinear sampling: the STN/augmentation fast path.

    Observation: for the near-identity warps an STN produces, all samples of
    one OUTPUT row lie within a few INPUT rows. So instead of gathering a
    full image row per output pixel (bilinear_sample: B*N row gathers), we
    gather a ``band``-row window per output ROW (16x less gather traffic)
    and do the whole bilinear interpolation as ONE einsum against a combined
    corner-weight matrix over W (MXU work, f32) + a tiny masked reduce over
    the band.

    When a batch's worst output-row span exceeds the band (e.g. rotations
    beyond ~15 deg at 32 px height), we step down a LADDER of doubled bands
    (band, 2*band, ..., H) via nested lax.cond — the last rung covers every
    possible span, so the slow row-gather path is never taken, and one
    aggressive warp in a batch only doubles the einsum width instead of
    sending all images down :func:`bilinear_sample` (which a batch-global
    fallback used to do).

    Identical math to bilinear_sample (weights from unclipped positions,
    border-clamped indices); unit-tested against it and map_coordinates.
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = coords.shape

    x = (coords[..., 0] + 1.0) * (W - 1) / 2.0  # (B, Ho, Wo)
    y = (coords[..., 1] + 1.0) * (H - 1) / 2.0

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)

    y_min = jnp.min(y0, axis=2)  # (B, Ho)
    y_max = jnp.max(y1, axis=2)
    span = jnp.max(y_max - y_min)

    def banded(b):
        def run(_):
            base = jnp.clip(y_min, 0, max(H - b, 0))  # (B, Ho)
            ridx = base[:, :, None] + jnp.arange(b)[None, None, :]
            ridx = jnp.minimum(ridx, H - 1).reshape(B, Ho * b)
            win = jnp.take_along_axis(
                img, ridx[:, :, None, None], axis=1
            ).reshape(B, Ho, b, W, C)

            # combined horizontal corner weights: (B, Ho, Wo, W)
            iw = jnp.arange(W)[None, None, None, :]
            mxc = wx0[..., None] * (iw == x0[..., None]) + wx1[
                ..., None
            ] * (iw == x1[..., None])
            # x-interpolated values at every band row: (B, Ho, b, Wo, C)
            s = jnp.einsum(
                "birwc,bijw->birjc",
                win.astype(jnp.float32),
                mxc,
                precision=jax.lax.Precision.HIGHEST,
            )
            # combined vertical corner weights over the band: (B,Ho,Wo,b)
            r0 = (y0 - base[:, :, None])[..., None]  # (B, Ho, Wo, 1)
            r1 = (y1 - base[:, :, None])[..., None]
            ir = jnp.arange(b)[None, None, None, :]
            myc = wy0[..., None] * (ir == r0) + wy1[..., None] * (ir == r1)
            # out[b,i,j,c] = sum_r myc[b,i,j,r] * s[b,i,r,j,c]
            out = jnp.einsum(
                "bijr,birjc->bijc",
                myc,
                s,
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.astype(img.dtype)

        return run

    # Band ladder: band, 2*band, 4*band, ..., capped at H (which admits any
    # span: base clips to 0 and the window is the whole image).
    bands = []
    b = band
    while b < H:
        bands.append(b)
        b *= 2
    bands.append(H)

    def level(i):
        if i == len(bands) - 1:
            return banded(bands[i])
        # nested cond thunks: only the selected rung executes (a closure
        # capturing a precomputed value would evaluate every rung eagerly)
        return lambda _: jax.lax.cond(
            span <= bands[i] - 1, banded(bands[i]), level(i + 1), None
        )

    return level(0)(None)


def grid_sample_affine(
    img: jnp.ndarray, theta: jnp.ndarray, out_height: int | None = None,
    out_width: int | None = None, use_pallas: bool | None = None,
    mesh=None, interpret: bool = False,
) -> jnp.ndarray:
    """Warp ``img`` by affine ``theta``: the full STN sampling path.

    ``use_pallas=None`` -> the VMEM-resident Pallas kernel
    (kernels/grid_sample.py) on single-device TPU backends, or on a
    multi-device ``mesh`` via shard_map (batch is the only sharded axis);
    the XLA banded sampler otherwise (CPU, unsupported shapes, or
    mesh-less multi-device execution where a bare pallas_call has no SPMD
    partitioning rule).
    """
    import functools

    B, H, W, C = img.shape
    Ho = out_height or H
    Wo = out_width or W
    coords = affine_grid(theta, Ho, Wo)

    from crnn_ocr_tpu.kernels.grid_sample import (
        bilinear_sample_pallas,
        pallas_sampler_default,
        sampler_supported,
    )

    if use_pallas is None:
        use_pallas = pallas_sampler_default() and (
            mesh is not None or jax.device_count() == 1
        )
    n_shards = mesh.size if mesh is not None else 1
    if (
        use_pallas
        and sampler_supported(img.shape, coords.shape)
        and B % n_shards == 0
    ):
        call = functools.partial(bilinear_sample_pallas, interpret=interpret)
        if n_shards > 1:
            from jax.sharding import PartitionSpec as P

            spec = P(mesh.axis_names[0], None, None, None)
            # check_vma=False: pallas_call out_shapes carry no varying-
            # mesh-axes metadata (same as the RNN/CTC kernels)
            call = jax.shard_map(
                call, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
                check_vma=False,
            )
        return call(img, coords)
    return bilinear_sample_banded(img, coords)
