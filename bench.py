"""Benchmark harness: text-lines/sec/chip, greedy decode (BASELINE.json).

Runs the flagship CRNN inference path exactly as a user would serve it —
fused device preprocess -> forward -> softmax -> on-device greedy CTC decode
— on whatever backend the environment provides (the driver runs it on the
real TPU chip), and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` is the ratio against the measured CPU-Keras anchor
(benchmarks/cpu_keras_anchor.json, produced by tools/measure_cpu_baseline.py
on this machine — the reference's deployment target per SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from crnn_ocr_tpu.models import CRNN, ModelConfig
    from crnn_ocr_tpu.ops import ctc
    from crnn_ocr_tpu.ops.preprocess import preprocess_batch

    B = int(os.environ.get("BENCH_BATCH", "256"))
    WIDTH = int(os.environ.get("BENCH_WIDTH", "128"))
    REPS = int(os.environ.get("BENCH_REPS", "20"))

    cfg = ModelConfig(
        num_classes=80,
        width=WIDTH,
        dtype="bfloat16",
        use_pallas_rnn=os.environ.get("BENCH_PALLAS", "0") == "1",
    )
    model = CRNN(cfg=cfg)

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, size=(B, 48, 192)).astype(np.uint8)
    heights = np.full((B,), 48, np.int32)
    widths = rng.integers(80, 192, size=(B,)).astype(np.int32)

    x0 = jnp.zeros((B, cfg.height, WIDTH, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0,
        train=False,
    )

    @jax.jit
    def serve(variables, raw, heights, widths):
        x, w_new = preprocess_batch(
            raw, heights, widths, out_h=cfg.height, out_w=WIDTH
        )
        logits = model.apply(variables, x[..., None], train=False)
        probs = jax.nn.softmax(logits[:, cfg.ctc_time_slice :, :], axis=-1)
        T = probs.shape[1]
        input_len = jnp.clip(
            w_new // cfg.width_downsample - cfg.ctc_time_slice, 1, T
        )
        decoded, score = ctc.ctc_greedy_decode(probs, input_len)
        return decoded, score

    raw_d = jax.device_put(raw)
    h_d = jax.device_put(heights)
    w_d = jax.device_put(widths)

    def materialize(out):
        # On the axon (TPU-tunnel) backend block_until_ready returns before
        # execution finishes (measured: 0.2ms "steps"); only host
        # materialization truly synchronizes. Convert outputs to numpy.
        return tuple(np.asarray(o) for o in out)

    # compile + warmup
    t0 = time.perf_counter()
    materialize(serve(variables, raw_d, h_d, w_d))
    compile_s = time.perf_counter() - t0
    materialize(serve(variables, raw_d, h_d, w_d))

    # Amortized throughput: enqueue REPS batches back-to-back, synchronize
    # once at the end (the realistic serving pipeline), plus a per-batch
    # synchronized latency probe.
    t0 = time.perf_counter()
    outs = [serve(variables, raw_d, h_d, w_d) for _ in range(REPS)]
    materialize(outs[-1])
    total_s = time.perf_counter() - t0
    step_s = total_s / REPS
    lines_per_sec = B / step_s

    lat_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        materialize(serve(variables, raw_d, h_d, w_d))
        lat_times.append(time.perf_counter() - t0)
    p50_latency_s = float(np.median(lat_times))

    vs_baseline = 0.0
    anchor_path = os.path.join(
        os.path.dirname(__file__), "benchmarks", "cpu_keras_anchor.json"
    )
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor = json.load(f)
        base = anchor["results"].get("batch64", {}).get("lines_per_sec")
        if base:
            vs_baseline = lines_per_sec / base

    dbg = {
        "device": str(jax.devices()[0]),
        "batch": B,
        "width": WIDTH,
        "compile_s": round(compile_s, 2),
        "amortized_batch_ms": round(1e3 * step_s, 3),
        "synced_batch_ms": round(1e3 * p50_latency_s, 3),
    }
    print(json.dumps(dbg), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "text_lines_per_sec_chip_greedy",
                "value": round(lines_per_sec, 2),
                "unit": "lines/sec",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
