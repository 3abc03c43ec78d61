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


def _prefetched(gen, prefetch: int):
    """Drain ``gen`` on a daemon thread through a bounded queue.

    Exceptions in the producer (e.g. a corrupt image failing cv2 decode)
    PROPAGATE to the consumer instead of silently ending the stream — a
    swallowed IOError here would make training stop early and checkpoint
    as if the run completed."""
    if prefetch <= 0:
        yield from gen
        return
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END, _ERR = object(), object()

    def worker():
        try:
            for item in gen:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            q.put((_ERR, e))
        else:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item


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
    n_produced = int(augment_offset)

    def produce(b):
        nonlocal n_produced
        out = produce_batch(
            b,
            width_downsample=width_downsample,
            ctc_time_slice=ctc_time_slice,
            out_h=out_h,
            normalize=normalize,
            augment=augment,
            augment_seed=augment_seed,
            index=n_produced,
        )
        if augment:
            n_produced += 1
        return out

    for b in _prefetched(host_iter, prefetch):
        yield produce(b)


def produce_batch(
    b: Dict[str, np.ndarray],
    width_downsample: int = 4,
    ctc_time_slice: int = 2,
    out_h: int = 32,
    normalize: bool = True,
    augment: bool = False,
    augment_seed: int = 0,
    index: int = 0,
) -> Dict[str, jnp.ndarray]:
    """One raw host batch -> device batch (fused preprocess + optional
    augmentation). ``index`` is the batch's global produce index — the
    augmentation key stream, kept stable under resume and under the
    multi-step path's bucket regrouping."""
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

        from crnn_ocr_tpu.ops.augment import augment_batch

        x = augment_batch(
            x, jax.random.fold_in(jax.random.key(augment_seed), index)
        )
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


def stack_host_batches(
    host_iter: Iterator[Dict[str, np.ndarray]],
    n_inner: int,
    prefetch: int = 2,
    index_offset: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Group raw host batches into same-bucket stacks of ``n_inner`` for the
    multi-step train path (``train.step.make_multi_train_step``).

    Rationale: on hosts where per-dispatch latency or per-call overhead
    dominates (this environment's TPU sits behind a ~30-50 ms tunnel), one
    jitted ``lax.scan`` over K steps replaces K separate (upload, preprocess,
    step) dispatch rounds with ONE upload and ONE dispatch — the device-side
    math is identical (see the bit-parity test in tests/test_train_multi.py).

    Stacked dicts carry ``stacked=n_inner`` plus arrays with a leading K
    axis: ``the_input`` (K, B, Hq, Wq) uint8 — canvases padded (white) to the
    group max and snapped up a quantization ladder so the set of compiled
    multi-step programs stays bounded on native-size corpora — ``heights``/
    ``widths``/``label_length`` (K, B), ``the_labels`` (K, B, L),
    ``batch_index`` (K,) global produce indices (augmentation key stream),
    and the common ``bucket``.

    Batches are regrouped by bucket, so with multiple buckets the STEP ORDER
    differs from the single-step stream (same batches, same count); with a
    single bucket the stream is identical. Leftover groups at end of stream
    (fewer than ``n_inner`` of a bucket) yield as plain single batches —
    consumers fall back to the single-step path for those.
    """
    from crnn_ocr_tpu.ops.preprocess import quantize_dim

    if n_inner <= 1:
        yield from host_iter
        return

    def stacks():
        pending: Dict[int, list] = {}
        n_produced = int(index_offset)
        for b in host_iter:
            b = dict(b)
            b["batch_index"] = n_produced
            n_produced += 1
            bucket = int(b["bucket"])
            group = pending.setdefault(bucket, [])
            group.append(b)
            if len(group) == n_inner:
                yield _stack_group(pending.pop(bucket), bucket, quantize_dim)
        # end of a bounded stream: flush partial groups as plain raw
        # batches (consumers produce them through the single-step path;
        # batch_index stays attached for augment-key alignment)
        for bucket in sorted(pending):
            yield from pending[bucket]

    yield from _prefetched(stacks(), prefetch)


def _stack_group(group, bucket: int, quantize_dim) -> Dict[str, np.ndarray]:
    """Stack ``n_inner`` same-bucket host batches into one K-leading dict."""
    hq = quantize_dim(max(int(b["the_input"].shape[1]) for b in group))
    wq = quantize_dim(max(int(b["the_input"].shape[2]) for b in group))
    K = len(group)
    B = group[0]["the_input"].shape[0]
    canvas = np.full((K, B, hq, wq), 255, np.uint8)
    for k, b in enumerate(group):
        _, h, w = b["the_input"].shape
        canvas[k, :, :h, :w] = b["the_input"]
    return {
        "stacked": K,
        "the_input": canvas,
        "heights": np.stack([b["heights"] for b in group]),
        "widths": np.stack([b["widths"] for b in group]),
        "the_labels": np.stack([b["the_labels"] for b in group]),
        "label_length": np.stack([b["label_length"] for b in group]),
        "batch_index": np.array(
            [b["batch_index"] for b in group], np.int32
        ),
        "bucket": bucket,
        "texts": [b.get("texts") for b in group],
    }


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
