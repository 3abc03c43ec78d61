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
        # fused Pallas recurrence: measured 1.56x over the XLA scan at these
        # shapes (0.048 vs 0.075 ms/layer, tunnel-free in-jit timing)
        use_pallas_rnn=os.environ.get("BENCH_PALLAS", "1") == "1",
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

    # ---- measurement methodology ----
    # This dev environment reaches the chip through a network tunnel whose
    # per-call RTT is ~30 ms and whose block_until_ready is async, so
    # per-call host timing measures the tunnel, not the device. Ground
    # truth: loop K batches INSIDE one jit (lax.scan), synchronize once via
    # host materialization, subtract the tunnel RTT measured with a trivial
    # program. (Verified: per-call timing reads 2.98 ms/batch where the
    # device actually takes 0.72 ms.)
    # K sized so DEVICE time dominates the tunnel RTT: at ~0.9 ms/batch,
    # K=32 put ~29 ms of compute behind a ~40 ms RTT, and the RTT-estimate
    # error (±10 ms across calls) leaked straight into the step time
    # (±0.3 ms/step — the round-2 headline under-read the chip by ~1.9x
    # vs the cross-checked benchmarks/run_all.py row at identical shapes).
    # K=256 puts ~230 ms behind the same RTT, bounding that error at ~4%.
    # The K distinct input batches are DERIVED ON DEVICE inside the scan
    # (base batch XOR step counter) — one 2.3 MB host->device transfer
    # instead of K of them, so large K costs no tunnel bandwidth. The XOR
    # depends on the scanned step index, so XLA cannot hoist the body
    # (hoisted constant bodies read as fake sub-ms steps on this tunnel).
    # Widths stay paired with their images across steps: every step is a
    # real batch with true per-image valid widths.
    K = int(os.environ.get("BENCH_SCAN_LEN", "256"))
    raw_d = jnp.asarray(raw)
    hs_d = jnp.asarray(heights)
    ws_d = jnp.asarray(widths)

    @jax.jit
    def serve_k(variables, raw_d, hs_d, ws_d):
        # Returns scalars only: an on-device checksum of every decode forces
        # full execution while keeping the host transfer at 8 bytes — the
        # metric is chip compute throughput, and this dev tunnel's bandwidth
        # (unlike a TPU-VM PCIe link) would otherwise dominate.
        def one(carry, k):
            raw_k = raw_d ^ k.astype(jnp.uint8)
            decoded, score = serve(variables, raw_k, hs_d, ws_d)
            return (
                carry[0] + jnp.sum(score),
                carry[1] + jnp.sum(decoded),
            ), None

        (total, chk), _ = jax.lax.scan(
            one, (jnp.float32(0), jnp.int32(0)), jnp.arange(K)
        )
        return total, chk

    @jax.jit
    def trivial(x):
        return x + 1

    np.asarray(trivial(jnp.ones(8)))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial(jnp.ones(8)))
        rtts.append(time.perf_counter() - t0)
    rtt_s = float(np.min(rtts))  # min = noise-floor estimator

    t0 = time.perf_counter()
    out = serve_k(variables, raw_d, hs_d, ws_d)
    np.asarray(out[0])
    compile_s = time.perf_counter() - t0

    totals = []
    for _ in range(max(4, REPS // 5)):
        t0 = time.perf_counter()
        tot, chk = serve_k(variables, raw_d, hs_d, ws_d)
        np.asarray(tot), np.asarray(chk)
        totals.append(time.perf_counter() - t0)
    # min-of-trials (tunnel adds only positive noise)
    step_s = (float(np.min(totals)) - rtt_s) / K
    lines_per_sec = B / step_s
    # p50 = median over trials (RTT-free device batch latency)
    p50_latency_s = (float(np.median(totals)) - rtt_s) / K

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
        "device_batch_ms": round(1e3 * step_s, 3),
        "tunnel_rtt_ms": round(1e3 * rtt_s, 1),
    }
    print(json.dumps(dbg), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "text_lines_per_sec_chip_greedy",
                "value": round(lines_per_sec, 2),
                "unit": "lines/sec",
                "vs_baseline": round(vs_baseline, 2),
                # BASELINE.json metric text names p50 latency alongside
                # throughput; device batch latency (p50 over reps, RTT-free)
                "p50_latency_ms": round(1e3 * p50_latency_s, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
