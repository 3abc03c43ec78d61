"""Serving runtime: dynamic micro-batching + HTTP daemon.

The reference's deployment unit is a script invocation (SURVEY.md C11);
on TPU the unit is a resident process that keeps compiled programs warm
and coalesces concurrent requests into MXU-sized batches. See
``batcher.py`` (scheduler) and ``http.py`` (front-end)."""

from crnn_ocr_tpu.serve.batcher import (
    BatcherStats,
    DynamicBatcher,
    batch_ladder,
)
from crnn_ocr_tpu.serve.http import OCRServer, decode_image_bytes

__all__ = [
    "BatcherStats",
    "DynamicBatcher",
    "OCRServer",
    "batch_ladder",
    "decode_image_bytes",
]
