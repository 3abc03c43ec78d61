"""Capture + summarize an xplane device trace of the exact beam decoder.

Per-HLO-op device times for the b32/W=10 exact beam decode (the weakest
perf axis — VERDICT round-1 item 1). Decoder-only on near-uniform
posteriors (the untrained-model distribution the beam10_b32_w128 sweep
config feeds it), where the cheap-proof fast path decides ~29/30 frames.

Run: python benchmarks/trace_beam.py [logdir]   (TPU env)
Writes benchmarks/trace_beam_summary.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_train import summarize  # noqa: E402


def capture(logdir: str) -> None:
    import jax
    import jax.numpy as jnp

    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf

    B = int(os.environ.get("TRACE_BEAM_B", "32"))
    T, C = 30, 81
    rng = np.random.default_rng(0)
    if os.environ.get("TRACE_BEAM_SHARP", "0") == "1":
        # peaked (trained-model-like) posteriors — the deployment regime,
        # where ~2.8%/sample-frame cheap-proof rejections make nearly every
        # frame run the exact tier at B=256 (tools/diag_beam_tiers.py)
        logits = rng.normal(size=(B, T, C)).astype(np.float32)
        peak = rng.integers(0, C, size=(B, T))
        logits[np.arange(B)[:, None], np.arange(T)[None, :], peak] += 6.0
    else:
        # near-uniform posteriors (untrained model on noise)
        logits = rng.normal(scale=0.1, size=(B, T, C)).astype(np.float32)
    probs = jax.device_put(
        np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    )
    il = jax.device_put(np.full((B,), T, np.int32))

    @jax.jit
    def decode_k(probs, il):
        def one(carry, _):
            dec, sc = ctc_beam_search_decode_tf(
                probs + carry * 1e-9, il, beam_width=10, top_paths=1
            )
            return carry + 1.0, (jnp.sum(dec), jnp.sum(sc))

        _, (d, s) = jax.lax.scan(one, jnp.float32(0), None, length=8)
        return jnp.sum(d), jnp.sum(s)

    out = decode_k(probs, il)  # compile
    np.asarray(out[0])
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = decode_k(probs, il)
            np.asarray(out[0])


def main() -> int:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xplane_beam"
    capture(logdir)
    summary = summarize(logdir, steps=8 * 3)
    suffix = ("_sharp" if os.environ.get("TRACE_BEAM_SHARP", "0") == "1"
              else "")
    bsz = os.environ.get("TRACE_BEAM_B", "32")
    name = (f"trace_beam{suffix}_b{bsz}_summary.json"
            if (suffix or bsz != "32") else "trace_beam_summary.json")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in summary if k != "top_ops_ms_per_step"}))
    for k, v in list(summary.get("top_ops_ms_per_step", {}).items())[:25]:
        print(f"{v:9.5f}  {k[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
