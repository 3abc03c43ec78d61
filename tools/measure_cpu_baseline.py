"""Measure the reference-equivalent CPU Keras baseline (BASELINE.md TODO #1).

Assembles a tf_keras CRNN with the topology SURVEY.md §2.1 C4 pins for the
reference (depthwise-separable backbone -> reshape -> TimeDistributed Dense
-> 2x Bidirectional GRU -> softmax) and measures text-lines/sec for
model.predict + K.ctc_decode greedy on this machine's CPU — the denominator
of the north-star ">=20x CPU-Keras lines/sec on one v5e chip"
(BASELINE.json). Writes benchmarks/cpu_keras_anchor.json.

Run: python tools/measure_cpu_baseline.py [--batch 64] [--reps 5]
"""

import argparse
import json
import os
import platform
import sys
import time

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np


def build_keras_crnn(num_classes=80, height=32, width=128,
                     n_units=256, time_dense_size=128):
    import tf_keras as keras
    from tf_keras import layers as L

    inp = keras.Input(shape=(height, width, 1), name="the_input")
    x = L.Conv2D(64, 3, padding="same", use_bias=False)(inp)
    x = L.BatchNormalization()(x)
    x = L.Activation("relu")(x)
    x = L.MaxPooling2D((2, 2))(x)
    for filters, pool in zip((128, 256, 256, 512),
                             ((2, 2), (2, 1), (2, 1), (2, 1))):
        x = L.DepthwiseConv2D(3, padding="same", use_bias=False)(x)
        x = L.Conv2D(filters, 1, use_bias=False)(x)
        x = L.BatchNormalization()(x)
        x = L.Activation("relu")(x)
        x = L.MaxPooling2D(pool)(x)
    # (B, 1, T, C) -> (B, T, C)
    x = L.Reshape((width // 4, 512))(x)
    x = L.Dense(time_dense_size, activation="relu")(x)
    for _ in range(2):
        x = L.Bidirectional(L.GRU(n_units, return_sequences=True))(x)
        x = L.BatchNormalization()(x)
    out = L.Dense(num_classes + 1, activation="softmax", name="softmax")(x)
    return keras.Model(inp, out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--width", type=int, default=128)
    args = ap.parse_args()

    import tensorflow as tf
    from tf_keras import backend as K

    model = build_keras_crnn(width=args.width)
    n_params = model.count_params()
    rng = np.random.default_rng(0)

    results = {}
    for B in (1, args.batch):
        x = rng.normal(size=(B, 32, args.width, 1)).astype(np.float32)
        in_len = np.full((B,), args.width // 4 - 2, np.int32)
        # warmup
        probs = model.predict(x, verbose=0)
        K.ctc_decode(probs[:, 2:, :], in_len, greedy=True)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            probs = model.predict(x, verbose=0)
            dec, _ = K.ctc_decode(probs[:, 2:, :], in_len, greedy=True)
            _ = np.asarray(dec[0])
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        results[f"batch{B}"] = {
            "lines_per_sec": B / t,
            "p50_latency_ms": 1e3 * t / B,
            "median_step_s": t,
        }
        print(f"B={B}: {B/t:.2f} lines/sec, {1e3*t/B:.1f} ms/line")

    out = {
        "model": "tf_keras reference-equivalent CRNN (SURVEY.md C4)",
        "params": int(n_params),
        "tf_version": tf.__version__,
        "machine": {
            "platform": platform.platform(),
            "nproc": os.cpu_count(),
        },
        "input": {"height": 32, "width": args.width, "greedy": True},
        "results": results,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "cpu_keras_anchor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    sys.exit(main())
