"""End-to-end training throughput from an ON-DISK image corpus (VERDICT r3 #1).

Every committed train-step figure is device-only in-jit timing (the 36.4k
lines/s bf16 ceiling at B=128/W=128); SURVEY §3.5 names the host data
generator the reference's true bottleneck. This benchmark measures what a
user actually gets from `cli.train` over a files-layout corpus:

  1. UNCACHED:  cv2 decodes every image every epoch (the reference's Readf
                regime, minus its host resize — that part is device-fused);
  2. cache build: one decode+resize pass into mmap shards (data/packed.py),
                timed separately;
  3. CACHED:    --pack_cache steady state — batches assemble from mmap.

Sustained lines/s comes from metrics.jsonl over a post-warmup window
(compile time excluded). Emits one JSON blob and merges a
`train_e2e_files_b128` row into benchmarks/results.json.

Usage (on the TPU):
  python tools/make_font_corpus.py --out /tmp/fonts10k_w128 --n 10000 \
      --max_words 1 --max_w_new 128     # once
  python benchmarks/bench_train_e2e.py --path /tmp/fonts10k_w128
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# matches results.json train_step_b128_bf16 (3.52 ms device step at
# B=128/W=128 bf16 => 36.4k lines/s) — the ceiling the host must feed
DEVICE_CEILING_LINES_S = 36_400.0


def run_train(path: str, save: str, steps: int, pack: bool,
              log_every: int = 25, steps_per_call: int = 1,
              device_cache: bool = False,
              max_gb: "float | None" = None) -> dict:
    cmd = [
        sys.executable, "-m", "crnn_ocr_tpu.cli.train",
        "--path", path, "--buckets", "128", "--batch_size", "128",
        "--steps", str(steps), "--eval_every", "1000000",
        "--log_every", str(log_every), "--save_path", save,
    ]
    if pack:
        cmd.append("--pack_cache")
    if steps_per_call > 1:
        cmd += ["--steps_per_call", str(steps_per_call)]
    if device_cache:
        cmd.append("--device_cache")
    if max_gb is not None:
        cmd += ["--device_cache_max_gb", f"{max_gb:.6f}"]
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO)
    wall_total = time.time() - t0

    recs = []
    with open(os.path.join(save, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("kind") == "train":
                recs.append(r)
    # sustained window: the TAIL of the run (last 60% of steps, past at
    # least step 100). First-past-100 windowing proved fragile: one-time
    # program-load/compile stalls on the remote service can land a few
    # dispatches AFTER step 100 and pollute the whole window (measured
    # 2.7k "sustained" on a run whose actual tail paced 33.8k). lines_
    # per_sec in the log is cumulative (lines_seen / wall), so recover
    # absolute counters and difference the window.
    total = recs[-1]["step"]
    warm = [r for r in recs if r["step"] >= max(100, int(0.4 * total))]
    if len(warm) < 2:
        raise SystemExit(
            f"need >= 2 tail train records to difference a window "
            f"(have {len(warm)} of {len(recs)} total) — run "
            f"with --steps >= 200 or lower log_every"
        )
    a, b = warm[0], warm[-1]
    lines_a = a["lines_per_sec"] * a["wall"]
    lines_b = b["lines_per_sec"] * b["wall"]
    sustained = (lines_b - lines_a) / (b["wall"] - a["wall"])
    return {
        "steps": steps,
        "sustained_lines_per_sec": round(sustained, 1),
        "window_steps": [a["step"], b["step"]],
        "startup_s_incl_compile": round(recs[0]["wall"], 1),
        "wall_total_s": round(wall_total, 1),
        "final_loss": recs[-1]["loss"],
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", default="/tmp/fonts10k_w128")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--skip_uncached", action="store_true")
    p.add_argument("--skip_cached_single", action="store_true")
    p.add_argument("--steps_per_call", type=int, nargs="*", default=[16])
    p.add_argument("--device_cache_k", type=int, nargs="*", default=[16])
    p.add_argument("--partial_fractions", type=float, nargs="*", default=[],
                   help="additionally run --device_cache with the HBM "
                        "budget capped so only this fraction of pixel rows "
                        "is resident (overflow streams as miss payloads) — "
                        "the VERDICT r4 weak-#4 cliff measurement; e.g. 0.5")
    p.add_argument("--results_key", default="train_e2e_files_b128",
                   help="results.json key (use a distinct key for other "
                        "corpora so the flagship 10k rows are not clobbered)")
    args = p.parse_args(argv)

    pack_dir = os.path.join(args.path, ".crnn_pack")
    out = {"corpus": args.path,
           "n_images": sum(1 for _ in open(
               os.path.join(args.path, "annotation.txt")))}

    with tempfile.TemporaryDirectory() as td:
        if not args.skip_uncached:
            shutil.rmtree(pack_dir, ignore_errors=True)
            print("[e2e] UNCACHED run...", file=sys.stderr)
            out["uncached"] = run_train(
                args.path, os.path.join(td, "plain"), args.steps, pack=False
            )

        # timed cache build (host-only; decode+resize once per image)
        shutil.rmtree(pack_dir, ignore_errors=True)
        from crnn_ocr_tpu.data import Reader, ReaderConfig

        t0 = time.time()
        r = Reader(ReaderConfig(path=args.path, batch_size=128,
                                buckets=(128,), pack_cache=True))
        n = 0
        for i in range(len(r.samples)):
            r._load_image(r.samples[i][0])
            n += 1
        r._pack.flush_index()
        build_s = time.time() - t0
        out["cache_build"] = {
            "images": n,
            "build_s": round(build_s, 1),
            "images_per_sec": round(n / build_s, 1),
            "shard_mb": round(sum(
                os.path.getsize(os.path.join(pack_dir, f))
                for f in os.listdir(pack_dir)) / 1e6, 1),
        }
        print(f"[e2e] cache built: {out['cache_build']}", file=sys.stderr)

        if not args.skip_cached_single:
            print("[e2e] CACHED run...", file=sys.stderr)
            out["cached"] = run_train(
                args.path, os.path.join(td, "packed"), args.steps, pack=True
            )

        for K in args.steps_per_call:
            # cached + K-step scan dispatch (train.step.make_multi_train_step)
            # — amortizes the per-dispatch overhead the input-gap profile
            # attributes (benchmarks/input_gap_profile.json)
            print(f"[e2e] CACHED steps_per_call={K} run...", file=sys.stderr)
            out[f"cached_k{K}"] = run_train(
                args.path, os.path.join(td, f"packed_k{K}"), args.steps,
                pack=True, steps_per_call=K,
                log_every=max(25, K),
            )
            out[f"cached_k{K}"]["pct_of_ceiling"] = round(
                100 * out[f"cached_k{K}"]["sustained_lines_per_sec"]
                / DEVICE_CEILING_LINES_S, 1)

        for K in args.device_cache_k:
            # HBM-resident corpus (data/device_cache.py): zero pixel stream,
            # (K,B) row indices are the only per-call upload
            print(f"[e2e] DEVICE-CACHE steps_per_call={K} run...",
                  file=sys.stderr)
            key = f"cached_dev_k{K}"
            # log cadence: several dispatches per log point — at
            # log_every <= K EVERY dispatch pays the log-point overhead
            # (async copies + the metric-slice dispatch), measured at
            # 26.7k vs 35.6k lines/s on the 100k corpus
            out[key] = run_train(
                args.path, os.path.join(td, f"dev_k{K}"), args.steps,
                pack=True, steps_per_call=K, device_cache=True,
                log_every=max(25, 4 * K),
            )
            out[key]["pct_of_ceiling"] = round(
                100 * out[key]["sustained_lines_per_sec"]
                / DEVICE_CEILING_LINES_S, 1)

        for frac in args.partial_fractions:
            # partial residency: budget = label/width tables + frac of the
            # pixel shards; the rest streams per dispatch as miss payloads
            K = args.device_cache_k[0] if args.device_cache_k else 16
            pix_mb = out["cache_build"]["shard_mb"]
            tab_mb = out["n_images"] * 136 / 1e6  # (4*32+8) B/row
            max_gb = (tab_mb + frac * pix_mb + 0.5) / 1024
            print(f"[e2e] DEVICE-CACHE PARTIAL {frac:.0%} "
                  f"(max_gb={max_gb:.4f}) K={K} run...", file=sys.stderr)
            key = f"cached_dev_k{K}_partial{int(frac * 100)}"
            out[key] = run_train(
                args.path, os.path.join(td, f"dev_part{int(frac * 100)}"),
                args.steps, pack=True, steps_per_call=K, device_cache=True,
                max_gb=max_gb, log_every=max(25, 4 * K),
            )
            out[key]["pct_of_ceiling"] = round(
                100 * out[key]["sustained_lines_per_sec"]
                / DEVICE_CEILING_LINES_S, 1)

    out["device_ceiling_lines_per_sec"] = DEVICE_CEILING_LINES_S
    if "uncached" in out:
        out["uncached"]["pct_of_ceiling"] = round(
            100 * out["uncached"]["sustained_lines_per_sec"]
            / DEVICE_CEILING_LINES_S, 1)
    if "cached" in out:
        out["cached"]["pct_of_ceiling"] = round(
            100 * out["cached"]["sustained_lines_per_sec"]
            / DEVICE_CEILING_LINES_S, 1)

    res_path = os.path.join(REPO, "benchmarks", "results.json")
    try:
        with open(res_path) as f:
            results = json.load(f)
    except (OSError, ValueError):
        results = {}
    # merge: partial runs (--skip_*) update only the legs they measured
    prev = results.get(args.results_key, {})
    prev.update(out)
    results[args.results_key] = prev
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
