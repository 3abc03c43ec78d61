from crnn_ocr_tpu.models.crnn import (
    CRNN,
    ModelConfig,
    build_model,
    resolve_runtime_flags,
)
from crnn_ocr_tpu.models.rnn import BiRNN
from crnn_ocr_tpu.models.stn import STN

__all__ = ["CRNN", "ModelConfig", "build_model", "BiRNN", "STN"]
