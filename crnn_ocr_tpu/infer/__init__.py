from crnn_ocr_tpu.infer.predictor import (
    Prediction,
    Predictor,
    decode_predict_ctc,
    init_predictor,
)

__all__ = ["Prediction", "Predictor", "decode_predict_ctc", "init_predictor"]
