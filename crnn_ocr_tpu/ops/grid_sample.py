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
    """Bilinear sampling with border clamping.

    Args:
      img: (B, H, W, C) source images.
      coords: (B, Ho, Wo, 2) normalized (x, y) sample locations in [-1, 1].

    Returns:
      (B, Ho, Wo, C) sampled output, differentiable w.r.t. both inputs.
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = coords.shape

    x = (coords[..., 0] + 1.0) * (W - 1) / 2.0  # (B, Ho, Wo)
    y = (coords[..., 1] + 1.0) * (H - 1) / 2.0

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    # corner weights from unclipped positions (border clamp on indices only)
    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)

    flat = img.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, Ho * Wo, 1)  # (B, N, 1)
        out = jnp.take_along_axis(flat, idx, axis=1)  # (B, N, C)
        return out.reshape(B, Ho, Wo, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    w00 = (wy0 * wx0)[..., None]
    w01 = (wy0 * wx1)[..., None]
    w10 = (wy1 * wx0)[..., None]
    w11 = (wy1 * wx1)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def grid_sample_affine(
    img: jnp.ndarray, theta: jnp.ndarray, out_height: int | None = None,
    out_width: int | None = None,
) -> jnp.ndarray:
    """Warp ``img`` by affine ``theta``: the full STN sampling path."""
    B, H, W, C = img.shape
    Ho = out_height or H
    Wo = out_width or W
    coords = affine_grid(theta, Ho, Wo)
    return bilinear_sample(img, coords)
