"""Host->device input pipeline: prefetch thread + fused device preprocess.

Replaces the reference's fit_generator-fed python generator (its throughput
ceiling, SURVEY.md §3.5) with:

  host thread: decode images -> white-padded uint8 canvas   (cheap)
  device:      resize/pad/normalize fused under one jit     (preprocess.py)
  prefetch:    a small queue keeps the device fed while the host decodes

Batches arrive as dicts ready for the train step:
  x (B, 32, W_bucket) float32, input_length (B,), the_labels (B, L),
  label_length (B,). ``input_length`` already accounts for the conv
  downsample and the reference's 2-frame CTC slice.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax.numpy as jnp
import numpy as np

from crnn_ocr_tpu.ops.preprocess import preprocess_batch


def device_batches(
    host_iter: Iterator[Dict[str, np.ndarray]],
    width_downsample: int = 4,
    ctc_time_slice: int = 2,
    out_h: int = 32,
    normalize: bool = True,
    prefetch: int = 2,
    augment: bool = False,
    augment_seed: int = 0,
    augment_offset: int = 0,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Map raw host batches through the fused device preprocess graph
    (+ optional on-device augmentation, ops/augment.py).

    ``augment_offset``: global batch index of the first batch (resume
    support — keeps the augmentation key stream aligned with a fresh run).
    """
    if augment:
        import jax

        from crnn_ocr_tpu.ops.augment import augment_batch

        aug_key = jax.random.key(augment_seed)
    n_produced = int(augment_offset)

    def produce(b):
        nonlocal n_produced
        bucket = int(b["bucket"])
        x, w_new = preprocess_batch(
            b["the_input"],
            b["heights"],
            b["widths"],
            out_h=out_h,
            out_w=bucket,
            normalize=normalize,
        )
        if augment:
            import jax

            x = augment_batch(x, jax.random.fold_in(aug_key, n_produced))
            n_produced += 1
        T = bucket // width_downsample
        input_len = jnp.minimum(w_new // width_downsample, T) - ctc_time_slice
        input_len = jnp.maximum(input_len, 1)
        return {
            "x": x,
            "input_length": input_len.astype(jnp.int32),
            "the_labels": jnp.asarray(b["the_labels"]),
            "label_length": jnp.asarray(b["label_length"]),
            "texts": b.get("texts"),
            "bucket": bucket,
        }

    if prefetch <= 0:
        for b in host_iter:
            yield produce(b)
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()

    def worker():
        try:
            for b in host_iter:
                q.put(b)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is _END:
            return
        yield produce(b)


def synthetic_batches(
    batch_size: int = 32,
    bucket: int = 128,
    seed: int = 0,
    augment: bool = False,
    max_label_len: int = 16,
    steps: Optional[int] = None,
    synth=None,
    skip: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Host batch source over the synthetic glyph task (tests/benchmarks).

    Batch ``n`` draws from ``default_rng([seed, n])``, so the stream is
    random-access: ``skip`` fast-forwards for deterministic mid-run resume
    at zero cost (no discarded draws)."""
    from crnn_ocr_tpu.data.synthetic import SyntheticConfig, SyntheticTextlines
    from crnn_ocr_tpu.ops.preprocess import pack_canvas

    synth = synth or SyntheticTextlines(SyntheticConfig(augment=augment))
    n = int(skip)
    while steps is None or n < steps:
        rng = np.random.default_rng([seed, n])
        images, texts = synth.sample_batch(batch_size, rng)
        canvas, hs, ws = pack_canvas(images)
        labels, lab_len = synth.codec.encode_batch(texts, max_label_len)
        yield {
            "the_input": canvas,
            "heights": hs,
            "widths": ws,
            "the_labels": labels,
            "label_length": lab_len,
            "bucket": bucket,
            "texts": texts,
        }
        n += 1
