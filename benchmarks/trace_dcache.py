"""Xplane trace of the device-cache K-step scan (where do 6.5 ms/step go?).

The e2e ladder (results.json train_e2e_files_b128) puts
--device_cache --steps_per_call 16 at ~6.5 ms/step against the 3.52 ms bare
train step; this trace names the residual (HBM gather? normalize? scan-
carried state movement?) so further optimization targets facts.

Run: python benchmarks/trace_dcache.py   (TPU env, needs /tmp/fonts10k_w128)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("CORPUS", "/tmp/fonts10k_w128")
K = int(os.environ.get("TRACE_K", "16"))


def main() -> int:
    import jax

    from benchmarks.trace_train import summarize
    from crnn_ocr_tpu.data import Reader, ReaderConfig
    from crnn_ocr_tpu.data.device_cache import DeviceResidentCorpus
    from crnn_ocr_tpu.models import ModelConfig, resolve_runtime_flags
    from crnn_ocr_tpu.train import create_train_state
    from crnn_ocr_tpu.train.step import make_cached_multi_train_step
    from crnn_ocr_tpu.utils.profiling import xplane_trace

    r = Reader(ReaderConfig(path=CORPUS, batch_size=128, buckets=(128,),
                            pack_cache=True))
    corpus = DeviceResidentCorpus(r)
    cfg = resolve_runtime_flags(
        ModelConfig(num_classes=r.codec.num_classes, width=128,
                    dtype="bfloat16"),
        n_shards=1,
    )
    state = create_train_state(cfg, jax.random.key(0), batch_size=128)
    cached = make_cached_multi_train_step(cfg)
    rng = jax.random.key(1)
    stacks = []
    for st in corpus.stacked_index_batches(K):
        stacks.append(st)
        if len(stacks) == 4:
            break
    arrs = corpus.arrays(128)

    def call(st, stack):
        return cached(
            st, arrs["pixels"], arrs["widths"], arrs["labels"],
            arrs["lab_len"], stack["rows"], stack["batch_index"], rng,
            bucket=128,
        )

    state, ms = call(state, stacks[0])  # compile + warm
    float(ms["loss"][-1])
    logdir = "/tmp/trace_dcache"
    with xplane_trace(logdir):
        for stck in stacks[1:]:
            state, ms = call(state, stck)
        float(ms["loss"][-1])  # materialize into the trace

    out = summarize(logdir, top=30, steps=3 * K)
    out["note"] = (
        f"{len(stacks) - 1} cached_step calls of K={K} inner steps each; "
        f"per-step numbers divide device total by {(len(stacks) - 1) * K}"
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "trace_dcache_summary.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1)[:4000])
    return 0


if __name__ == "__main__":
    sys.exit(main())
