"""End-to-end serving-daemon benchmark: HTTP -> batcher -> device -> HTTP.

Unlike run_all.py's in-jit device timings, this measures the WHOLE serving
stack under concurrent load: request decode, queueing, coalescing, the
device program, and response marshalling. On this environment the TPU sits
behind a ~30-50 ms network tunnel, so per-batch dispatch cost is dominated
by tunnel RTT — the absolute numbers here are a floor for a real TPU-VM
deployment (where dispatch is microseconds), but batch-fill and scheduler
overhead are representative.

Run: python benchmarks/bench_serve.py [--requests 512] [--concurrency 64]
Writes/merges a "serve_daemon" row into benchmarks/results.json.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=512)
    p.add_argument("--warm_requests", type=int, default=128,
                   help="untimed burst first: compiles the quantized canvas "
                        "shapes this payload set hits")
    p.add_argument("--concurrency", type=int, default=64)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_wait_ms", type=float, default=8.0)
    p.add_argument("--beam_width", type=int, default=0,
                   help="0 = greedy decode (row serve_daemon); >0 = "
                        "on-device TF-exact beam (row serve_daemon_beamN). "
                        "Decode mode is fixed per daemon, as in the CLI.")
    args = p.parse_args()

    import jax

    from crnn_ocr_tpu.data.synthetic import (
        SyntheticConfig,
        SyntheticTextlines,
    )
    from crnn_ocr_tpu.infer import Predictor
    from crnn_ocr_tpu.models import ModelConfig
    from crnn_ocr_tpu.serve import OCRServer
    from crnn_ocr_tpu.train import create_train_state

    synth = SyntheticTextlines(SyntheticConfig())
    cfg = ModelConfig(num_classes=synth.codec.num_classes, width=128,
                      dtype="bfloat16")
    state = create_train_state(cfg, jax.random.key(0))
    predictor = Predictor(
        cfg, state.params, state.batch_stats, synth.codec,
        buckets=(128,),
    )
    decode_kw = (
        {"greedy": False, "beam_width": args.beam_width, "top_paths": 1}
        if args.beam_width > 0
        else None
    )
    srv = OCRServer(
        predictor,
        host="127.0.0.1",
        port=0,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        decode_kw=decode_kw,
    ).start()
    srv.batcher.warmup()

    rng = np.random.default_rng(0)
    images, _ = synth.sample_batch(32, rng)
    payloads = []
    for im in images:
        buf = io.BytesIO()
        np.save(buf, im)
        payloads.append(buf.getvalue())

    import urllib.request

    url = f"http://127.0.0.1:{srv.port}/predict"
    errors = [0]
    sem = threading.Semaphore(args.concurrency)

    def one(i):
        try:
            req = urllib.request.Request(
                url, data=payloads[i % len(payloads)], method="POST"
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                json.loads(r.read())
        except Exception:
            errors[0] += 1
        finally:
            sem.release()

    def burst(n):
        ts = []
        for i in range(n):
            sem.acquire()
            t = threading.Thread(target=one, args=(i,))
            t.start()
            ts.append(t)
        for t in ts:
            t.join(timeout=300)

    burst(args.warm_requests)  # compiles; untimed
    from crnn_ocr_tpu.serve import BatcherStats

    srv.batcher.stats = BatcherStats()
    errors[0] = 0
    t0 = time.perf_counter()
    burst(args.requests)
    wall = time.perf_counter() - t0
    snap = srv.batcher.stats.snapshot()
    srv.stop()

    rec = {
        "requests": args.requests,
        "concurrency": args.concurrency,
        "max_batch": args.max_batch,
        "decode": (f"beam{args.beam_width}" if args.beam_width > 0
                   else "greedy"),
        "errors": errors[0],
        "requests_per_sec": round(args.requests / wall, 1),
        "mean_batch_fill": snap["mean_batch_size"],
        "latency_ms_p50": round(snap["latency_ms_p50"], 1),
        "latency_ms_p95": round(snap["latency_ms_p95"], 1),
        "note": "end-to-end HTTP; tunnel RTT ~30-50ms per device dispatch "
                "dominates on this env (floor for a real TPU-VM)",
    }
    row = (
        f"serve_daemon_beam{args.beam_width}"
        if args.beam_width > 0
        else "serve_daemon"
    )
    print(row, rec, file=sys.stderr)
    out = os.path.join(os.path.dirname(__file__), "results.json")
    try:
        with open(out) as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {"configs": {}}
    results["configs"][row] = rec
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
