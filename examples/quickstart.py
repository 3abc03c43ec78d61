"""Quickstart: train a small recognizer and read text with it.

Runs anywhere jax runs (CPU is fine; a TPU makes it fast):

    python examples/quickstart.py

Trains on font-rendered English words for a few hundred steps, saves the
model, reloads it through the public predictor API, and prints
transcriptions with confidences — the same flow a user of the reference's
train.py/predict.py knows, as a library.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from crnn_ocr_tpu.data import FontTextlines, device_batches, synthetic_batches
    from crnn_ocr_tpu.infer import init_predictor
    from crnn_ocr_tpu.models import ModelConfig
    from crnn_ocr_tpu.train import FitConfig, create_train_state, fit

    save_dir = os.environ.get("QUICKSTART_DIR", "/tmp/quickstart_model")
    steps = int(os.environ.get("QUICKSTART_STEPS", "600"))

    fonts = FontTextlines()
    cfg = ModelConfig(num_classes=fonts.codec.num_classes, width=256)
    state = create_train_state(
        cfg, jax.random.key(0), learning_rate=1e-3,
        schedule="cosine", total_steps=steps,
    )

    def batches(seed, n=None):
        return device_batches(
            synthetic_batches(
                batch_size=32, bucket=256, steps=n, seed=seed, synth=fonts,
                max_label_len=24,
            )
        )

    print(f"training {steps} steps on {jax.devices()[0]} ...")
    fit(
        state,
        cfg,
        batches(0, steps),
        eval_iter_fn=lambda: batches(999, 2),
        codec=fonts.codec,
        cfg=FitConfig(
            steps=steps, eval_every=max(steps // 2, 1), eval_batches=2,
            checkpoint_dir=save_dir, log_every=100,
        ),
    )

    predictor = init_predictor(save_dir)
    rng = np.random.default_rng(4242)
    images, truth = fonts.sample_batch(6, rng)
    for pred, t in zip(
        predictor.predict(images, greedy=False, beam_width=10, top_paths=2),
        truth,
    ):
        status = "OK " if pred.text == t else "MISS"
        print(f"[{status}] read {pred.text!r} (truth {t!r}, "
              f"conf {pred.score:.2f})")

    # beyond the reference: per-character localization (greedy path)
    spans = predictor.predict_with_alignment(images[:1])[0]
    print("alignment:", " ".join(
        f"{s.char}@{s.x0}:{s.x1}({s.conf:.2f})" for s in spans
    ))


if __name__ == "__main__":
    main()
