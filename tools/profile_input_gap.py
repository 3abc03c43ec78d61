"""Attribute the cached-path host input gap, stage by stage (VERDICT r3 #1).

results.json ``train_e2e_files_b128`` measured the cached end-to-end path at
5.6k lines/s against a 36.4k lines/s device-step ceiling. This tool breaks
the ~19 ms/step of non-device wall time into its stages so the mitigation
targets the real cost, not a guess:

  assemble   mmap-row gather + pack_canvas + label encode (pure host)
  upload     host->device transfer of one batch's bytes (canvas + labels)
  preprocess dispatch of the fused resize/pad/normalize jit
  step       the train step itself (the known 3.52 ms bf16 figure)
  e2e        all of the above chained, as cli.train runs it

Each stage is timed over K repeats with a single trailing sync, per the
machine timing rules (.claude/skills/verify/SKILL.md): in-jit K-loops are
not possible for host stages, so upload/dispatch stages use distinct input
buffers and block only on the last result. Writes
benchmarks/input_gap_profile.json.

Run on the TPU:
  python tools/make_font_corpus.py --out /tmp/fonts10k_w128 --n 10000 \
      --max_words 1 --max_w_new 128     # once (round 3 already did)
  python tools/profile_input_gap.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PATH = os.environ.get("CORPUS", "/tmp/fonts10k_w128")
B = 128
K = int(os.environ.get("PROFILE_K", "60"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from crnn_ocr_tpu.data import Reader, ReaderConfig
    from crnn_ocr_tpu.data.pipeline import device_batches

    out = {"corpus": PATH, "batch_size": B, "repeats": K,
           "backend": jax.default_backend()}

    r = Reader(ReaderConfig(path=PATH, batch_size=B, buckets=(128,),
                            pack_cache=True))

    # ---- stage 1: host batch assembly (no device work at all) ----
    gen = r.run_generator(train=True)
    batches = []
    t0 = time.perf_counter()
    for _ in range(K):
        batches.append(next(gen))
    assemble_s = time.perf_counter() - t0
    out["assemble_ms_per_batch"] = round(1e3 * assemble_s / K, 2)

    # ---- stage 2: upload bandwidth (distinct buffers, single sync) ----
    bufs = [b["the_input"].copy() for b in batches]
    nbytes = bufs[0].nbytes
    # warm the transfer path
    jax.device_put(bufs[0]).block_until_ready()
    t0 = time.perf_counter()
    devs = [jax.device_put(b) for b in bufs]
    devs[-1].block_until_ready()
    upload_s = time.perf_counter() - t0
    del devs
    out["upload_ms_per_batch"] = round(1e3 * upload_s / K, 2)
    out["upload_bytes_per_batch"] = int(nbytes)
    out["upload_MB_per_s"] = round(nbytes * K / upload_s / 1e6, 1)

    # ---- stage 3: assembled -> device batch (upload + preprocess jit) ----
    def pipe(src):
        return device_batches(iter(src), prefetch=0)

    for db in pipe(batches[:2]):  # warm compile
        jax.block_until_ready(db["x"])
    t0 = time.perf_counter()
    last = None
    for db in pipe(batches):
        last = db["x"]
    jax.block_until_ready(last)
    preproc_s = time.perf_counter() - t0
    out["upload_plus_preprocess_ms_per_batch"] = round(1e3 * preproc_s / K, 2)

    # ---- stage 4: the device train step on a resident batch ----
    # mirrors cli.train's flagship config (bf16-on-TPU, runtime flags)
    from crnn_ocr_tpu.models import ModelConfig, resolve_runtime_flags
    from crnn_ocr_tpu.train import step as step_lib
    from crnn_ocr_tpu.train.state import create_train_state

    cfg = resolve_runtime_flags(
        ModelConfig(num_classes=r.codec.num_classes, width=128,
                    dtype="bfloat16"),
        n_shards=1,
    )
    state = create_train_state(cfg, jax.random.key(0), batch_size=B)
    train_step = step_lib.make_train_step(cfg)
    rng = jax.random.key(1)
    dbs = list(pipe(batches))
    for db in dbs:
        db.pop("texts", None), db.pop("bucket", None)
        jax.block_until_ready(db["x"])
    state, m = train_step(state, dbs[0], rng)  # compile
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for db in dbs:
        state, m = train_step(state, db, rng)
    jax.block_until_ready(m["loss"])
    step_s = time.perf_counter() - t0
    out["train_step_resident_ms_per_batch"] = round(1e3 * step_s / K, 2)
    out["train_step_resident_note"] = (
        "ENQUEUE rate, not device time — this environment's "
        "block_until_ready returns before execution (see "
        ".claude/skills/verify/SKILL.md); the true device step is the "
        "in-jit K-loop figure in results.json train_step_b128_bf16 "
        "(3.52 ms). Wall-clock stages (assemble/e2e) are unaffected."
    )

    # ---- stage 5: full chain exactly as cli.train wires it ----
    gen2 = r.run_generator(train=True)
    full = device_batches(gen2, prefetch=2)
    db = next(full)
    db.pop("texts", None), db.pop("bucket", None)
    state, m = train_step(state, db, rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(K):
        db = next(full)
        db.pop("texts", None), db.pop("bucket", None)
        state, m = train_step(state, db, rng)
    jax.block_until_ready(m["loss"])
    e2e_s = time.perf_counter() - t0
    out["e2e_ms_per_batch"] = round(1e3 * e2e_s / K, 2)
    out["e2e_lines_per_sec"] = round(B * K / e2e_s, 1)

    with open(os.path.join(REPO, "benchmarks", "input_gap_profile.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
