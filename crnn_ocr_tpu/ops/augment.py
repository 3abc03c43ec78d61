"""On-device training augmentations (BASELINE.json config 5's
"augmentation pipeline", TPU-native).

The reference augments on the host per image inside its python generator;
here augmentation is a pure jitted function over the whole preprocessed
batch, fused by XLA into the input pipeline: brightness/contrast jitter,
Gaussian noise, and a small random affine warp (shear/rotate/translate)
through the same grid sampler the STN uses — so the warp is MXU/VPU work,
not host cv2.

Applies AFTER preprocess_batch (inputs are (B, H, W) floats); keyed by a
jax PRNG key, fully deterministic given the key.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from crnn_ocr_tpu.ops.grid_sample import grid_sample_affine


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    brightness: float = 0.1  # +- additive, in normalized units
    contrast: float = 0.1  # +- multiplicative
    noise_std: float = 0.03
    shear: float = 0.08  # horizontal shear extent (normalized)
    rotate: float = 0.02  # radians
    translate: float = 0.02  # fraction of extent
    enabled: bool = True


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(
    x: jnp.ndarray, key: jax.Array, cfg: AugmentConfig = AugmentConfig()
) -> jnp.ndarray:
    """x: (B, H, W) float32 preprocessed frames -> augmented frames."""
    if not cfg.enabled:
        return x
    B, H, W = x.shape
    k_b, k_c, k_n, k_sh, k_r, k_t = jax.random.split(key, 6)

    # photometric
    b = jax.random.uniform(k_b, (B, 1, 1), minval=-cfg.brightness,
                           maxval=cfg.brightness)
    c = 1.0 + jax.random.uniform(k_c, (B, 1, 1), minval=-cfg.contrast,
                                 maxval=cfg.contrast)
    x = x * c + b
    x = x + cfg.noise_std * jax.random.normal(k_n, x.shape)

    # geometric: theta = small shear + rotation + translation
    sh = jax.random.uniform(k_sh, (B,), minval=-cfg.shear, maxval=cfg.shear)
    r = jax.random.uniform(k_r, (B,), minval=-cfg.rotate, maxval=cfg.rotate)
    t = jax.random.uniform(k_t, (B, 2), minval=-cfg.translate,
                           maxval=cfg.translate)
    cos, sin = jnp.cos(r), jnp.sin(r)
    theta = jnp.stack(
        [cos, sh - sin, t[:, 0], sin, cos, t[:, 1]], axis=1
    )  # (B, 6)
    warped = grid_sample_affine(x[..., None], theta)[..., 0]
    return warped
