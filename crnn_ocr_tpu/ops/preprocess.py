"""Fused on-device image preprocessing (the reference's C1, TPU-native).

Reference contract (SURVEY.md C1, [DRIVER]): grayscale load -> height-
normalize to 32 px preserving aspect -> pad width with white to the bucket
width -> per-image normalization. The reference does this per image on the
host with cv2 (``utils.py#norm`` + padding helper) — its measured throughput
ceiling (SURVEY.md §3.5).

Here the whole thing is ONE jitted XLA graph over a padded uint8 batch:
``jax.image.scale_and_translate`` takes *traced* per-image scales, so a batch
of heterogeneous (h, w) images resizes+pads+normalizes on device with static
shapes — no per-image recompilation, no host loop. Host code only decodes
bytes and stacks them into a fixed canvas (see crnn_ocr_tpu.data).

Conventions:
  * resize sampling matches cv2.INTER_LINEAR (half-pixel centers,
    antialias=False default);
  * content width w' = round(w * out_h / h), columns >= w' forced to white
    (255) before normalization — callers must pad the input canvas with
    white so boundary bilinear blending blends against white;
  * normalization: x/255 then per-image (x - mean) / (std + 1e-7) over the
    full padded frame (flag-controlled, mirroring the reference's --norm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

WHITE = 255.0
NORM_EPSILON = 1e-7


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "normalize", "antialias")
)
def preprocess_batch(
    images: jnp.ndarray,
    heights: jnp.ndarray,
    widths: jnp.ndarray,
    out_h: int = 32,
    out_w: int = 128,
    normalize: bool = True,
    antialias: bool = False,
):
    """Resize-to-height + pad-to-bucket + normalize, fused under one jit.

    Args:
      images: (B, Hmax, Wmax) uint8/float canvas, white-padded beyond each
        image's true (h, w).
      heights: (B,) true image heights.
      widths: (B,) true image widths.
      out_h: target height (32 in the reference).
      out_w: bucket width (static per bucket).
      normalize: per-image standardization after /255.
      antialias: use antialiased resampling (cv2 parity wants False).

    Returns:
      (x, content_widths): (B, out_h, out_w) float32 preprocessed frames and
      (B,) int32 content widths (pre-padding), from which callers derive CTC
      input lengths.
    """
    heights = heights.astype(jnp.float32)
    widths = widths.astype(jnp.float32)

    def one(img, h, w):
        img = img.astype(jnp.float32)[..., None]  # (Hmax, Wmax, 1)
        # Images wider than the bucket squash to exactly out_w (the
        # reference resizes into a fixed (img_w, img_h) frame in that case).
        w_new = jnp.minimum(jnp.round(w * out_h / h), float(out_w))
        scale = jnp.stack([out_h / h, w_new / w])
        translation = jnp.zeros((2,), jnp.float32)
        scaled = jax.image.scale_and_translate(
            img,
            (out_h, out_w, 1),
            (0, 1),
            scale,
            translation,
            method="linear",
            antialias=antialias,
        )
        cols = jnp.arange(out_w, dtype=jnp.float32)
        mask = cols[None, :, None] < w_new
        out = jnp.where(mask, scaled, WHITE)
        return out[..., 0], w_new

    frames, w_news = jax.vmap(one)(images, heights, widths)
    x = frames / 255.0
    if normalize:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        std = jnp.std(x, axis=(1, 2), keepdims=True)
        x = (x - mean) / (std + NORM_EPSILON)
    return x, w_news.astype(jnp.int32)


def preprocess_resident(
    images: jnp.ndarray,
    widths: jnp.ndarray,
    normalize: bool = True,
):
    """Fast path of :func:`preprocess_batch` for DEVICE-RESIDENT packed rows
    (data/device_cache.py): the stored rows are already height-normalized to
    ``out_h`` and white-padded to the bucket, so the general
    scale-and-translate is an identity — skip it and keep only /255 +
    per-image standardization. Output matches
    ``preprocess_batch(rows, heights=out_h, widths, out_h, out_w=bucket)``
    to a few ulps (the identity resample still rounds at f32: max |Δ|
    6e-8 raw, 4.8e-7 after standardization;
    pinned by tests/test_preprocess.py::test_preprocess_resident_parity).

    Returns (x, content_widths) like preprocess_batch."""
    x = images.astype(jnp.float32) / 255.0
    if normalize:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        std = jnp.std(x, axis=(1, 2), keepdims=True)
        x = (x - mean) / (std + NORM_EPSILON)
    return x, widths.astype(jnp.int32)


def preprocess_host(
    img: np.ndarray,
    out_h: int = 32,
    out_w: int = 128,
    normalize: bool = True,
) -> np.ndarray:
    """Host-side reference implementation (cv2), mirroring the reference's
    utils.py#norm + padding helper. Used as the oracle in tests and as a
    fallback when no accelerator is present."""
    import cv2

    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    h, w = img.shape
    w_new = max(1, int(round(w * out_h / h)))
    w_new = min(w_new, out_w)
    resized = cv2.resize(img, (w_new, out_h), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((out_h, out_w), 255.0, np.float32)
    canvas[:, :w_new] = resized
    x = canvas / 255.0
    if normalize:
        x = (x - x.mean()) / (x.std() + NORM_EPSILON)
    return x


def quantize_dim(n: int, base: int = 16) -> int:
    """Snap ``n`` UP to a bounded shape ladder: {base, 1.5*base, 2*base,
    3*base, 4*base, ...} — powers of two of ``base`` and their 1.5x
    midpoints (≤50% padding waste, 2 distinct sizes per octave).

    Compiled-program cache control for serving arbitrary image sizes: the
    canvas shape is a jit cache key, so without snapping every distinct
    (Hmax, Wmax) a request burst produces pays a fresh XLA compile (seconds
    on a remote TPU) — measured 28.9 -> 290 req/s on the serving daemon."""
    q = base
    while q < n:
        q = q * 3 // 2 if (q & (q - 1)) == 0 else q * 4 // 3
    return q


def pack_canvas(images: "list[np.ndarray]", quantize: bool = False) -> tuple:
    """Stack variable-size grayscale images into a white-padded uint8 canvas.

    Accepts (H, W) grayscale or (H, W, 3/4) color arrays (converted with the
    standard luma weights, matching cv2's grayscale read within rounding).

    ``quantize`` snaps the canvas dims up the ``quantize_dim`` ladder so the
    set of jit-compiled preprocess shapes stays bounded under arbitrary
    request sizes (the padding is white, beyond every image's true (h, w),
    and numerically inert — per-image traced scales never sample it).

    Returns (canvas (B, Hmax, Wmax) uint8, heights (B,), widths (B,)).
    """
    if not images:
        raise ValueError("pack_canvas: empty image list")
    grays = []
    for im in images:
        im = np.asarray(im)
        if im.ndim == 3:
            rgb = im[..., :3].astype(np.float32)
            # cv2 BGR order for its readers; callers passing RGB differ only
            # in the .114/.299 swap — irrelevant for near-gray text scans.
            im = (
                0.114 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.299 * rgb[..., 2]
            ).round()
        if im.ndim != 2:
            raise ValueError(f"expected 2D/3D image, got shape {im.shape}")
        grays.append(np.clip(im, 0, 255).astype(np.uint8))
    heights = np.array([im.shape[0] for im in grays], np.int32)
    widths = np.array([im.shape[1] for im in grays], np.int32)
    Hm, Wm = int(heights.max()), int(widths.max())
    if quantize:
        Hm, Wm = quantize_dim(Hm), quantize_dim(Wm)
    canvas = np.full((len(grays), Hm, Wm), 255, np.uint8)
    for i, im in enumerate(grays):
        canvas[i, : im.shape[0], : im.shape[1]] = im
    return canvas, heights, widths
