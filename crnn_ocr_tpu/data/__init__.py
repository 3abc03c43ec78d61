from crnn_ocr_tpu.data.codec import LabelCodec, default_ocr_codec
from crnn_ocr_tpu.data.fontgen import FontConfig, FontTextlines
from crnn_ocr_tpu.data.packed import PackedCache
from crnn_ocr_tpu.data.pipeline import device_batches, synthetic_batches
from crnn_ocr_tpu.data.reader import Reader, ReaderConfig
from crnn_ocr_tpu.data.synthetic import SyntheticConfig, SyntheticTextlines

__all__ = [
    "FontConfig",
    "FontTextlines",
    "LabelCodec",
    "default_ocr_codec",
    "PackedCache",
    "Reader",
    "ReaderConfig",
    "SyntheticConfig",
    "SyntheticTextlines",
    "device_batches",
    "synthetic_batches",
]
