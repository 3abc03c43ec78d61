"""Device-cache transport triple: full-resident vs partial vs streamed.

Measures the SAME (K, B) train-step scan under its three pixel transports,
back-to-back in one process with dispatch-to-COMPLETION timing (enqueue N
dispatches, materialize the last metric — block_until_ready returns before
execution on the TPU tunnel, so a scalar fetch is the only honest sync):

  full     pixels resident in HBM, (K,B) int32 rows per dispatch
  partial  resident fraction R; overflow rows stream as a miss payload
           ((1-R) * batch bytes per dispatch)
  streamed --pack_cache regime: all pixels in the dispatch payload

This exists alongside bench_train_e2e.py because the e2e windowed method
proved fragile under remote-service jitter (one-time program-load stalls
land inside the measured window); the probe isolates the transport cost
itself. Writes/merges benchmarks/results.json `device_cache_probe`.

Run on the TPU: python benchmarks/bench_device_cache_probe.py
  [--path /tmp/fonts10k_w128] [--fraction 0.5] [--k 16] [--n 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", default="/tmp/fonts10k_w128")
    p.add_argument("--fraction", type=float, default=0.5)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--n", type=int, default=20)
    args = p.parse_args(argv)

    import jax

    from crnn_ocr_tpu.data import Reader, ReaderConfig
    from crnn_ocr_tpu.data.device_cache import DeviceResidentCorpus
    from crnn_ocr_tpu.models import ModelConfig, resolve_runtime_flags
    from crnn_ocr_tpu.train import create_train_state
    from crnn_ocr_tpu.train.step import (
        make_cached_multi_train_step,
        make_multi_train_step,
        make_partial_cached_multi_train_step,
    )

    def mk_reader():
        return Reader(ReaderConfig(
            path=args.path, batch_size=128, buckets=(128,),
            pack_cache=True, val_fraction=0.1,
        ))

    full = DeviceResidentCorpus(mk_reader())
    pix_bytes = sum(mm.nbytes for mm in full._mm.values())
    n_img = sum(mm.shape[0] for mm in full._mm.values())
    part = DeviceResidentCorpus(
        mk_reader(),
        max_bytes=int(n_img * 136 + args.fraction * pix_bytes),
    )
    assert part.partial, "fraction budget did not overflow"
    cfg = resolve_runtime_flags(ModelConfig(
        num_classes=full.reader.codec.num_classes, width=128,
        dtype="bfloat16",
    ))
    rng = jax.random.key(0)
    K, N = args.k, args.n

    def take_stacks(corpus, n):
        it = corpus.stacked_index_batches(K)
        return [next(it) for _ in range(n)]

    def timed(call, stacks):
        st = create_train_state(cfg, jax.random.key(0), batch_size=128)
        st, ms = call(st, stacks[0])
        np.asarray(ms["loss"])  # compile + drain
        t0 = time.perf_counter()
        for s_ in stacks[1:N + 1]:
            st, ms = call(st, s_)
        np.asarray(ms["loss"][-1])  # completion sync
        dt = time.perf_counter() - t0
        return {
            "ms_per_dispatch": round(dt / N * 1e3, 1),
            "lines_per_sec": round(N * K * 128 / dt, 0),
        }

    out = {"k": K, "n_dispatches": N, "corpus": args.path,
           "resident_fraction": round(part.resident_fraction, 3)}

    arrs_f = full.arrays(128)
    step_f = make_cached_multi_train_step(cfg, donate=False)
    out["full_resident"] = timed(
        lambda st, s_: step_f(
            st, arrs_f["pixels"], arrs_f["widths"], arrs_f["labels"],
            arrs_f["lab_len"], s_["rows"], s_["batch_index"], rng,
            bucket=128),
        take_stacks(full, N + 2),
    )
    print("[probe] full:", out["full_resident"], file=sys.stderr)

    arrs_p = part.arrays(128)
    step_p = make_partial_cached_multi_train_step(cfg, donate=False)
    pstacks = take_stacks(part, N + 2)
    out["partial"] = timed(
        lambda st, s_: step_p(
            st, arrs_p["pixels"], arrs_p["widths"], arrs_p["labels"],
            arrs_p["lab_len"], s_["miss_pixels"], s_["rows"],
            s_["pix_rows"], s_["batch_index"], rng, bucket=128),
        pstacks,
    )
    out["partial"]["payload_mb_per_dispatch"] = round(
        pstacks[1]["miss_pixels"].nbytes / 1e6, 1)
    print("[probe] partial:", out["partial"], file=sys.stderr)

    # streamed: same rows, pixels in the dispatch payload
    mm = full._mm[128]
    widths = np.asarray(arrs_f["widths"])
    labels = np.asarray(arrs_f["labels"])
    lab_len = np.asarray(arrs_f["lab_len"])
    sstacks = []
    for s_ in take_stacks(full, N + 2):
        rows = s_["rows"]
        sstacks.append({
            "the_input": mm[rows],
            "heights": np.full(rows.shape, 32, np.int32),
            "widths": widths[rows],
            "the_labels": labels[rows],
            "label_length": lab_len[rows],
            "batch_index": s_["batch_index"],
        })
    step_s = make_multi_train_step(cfg, donate=False)
    out["streamed"] = timed(
        lambda st, s_: step_s(st, s_, rng, bucket=128), sstacks)
    out["streamed"]["payload_mb_per_dispatch"] = round(
        sstacks[1]["the_input"].nbytes / 1e6, 1)
    print("[probe] streamed:", out["streamed"], file=sys.stderr)

    res_path = os.path.join(REPO, "benchmarks", "results.json")
    try:
        with open(res_path) as f:
            results = json.load(f)
    except (OSError, ValueError):
        results = {}
    results["device_cache_probe"] = out
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
