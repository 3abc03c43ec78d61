"""Capture + summarize an xplane device trace of the B=256 STN serve step.

Companion to trace_serve.py for the use_stn=True config: per-HLO-op device
times to locate the STN overhead (4.0 ms vs 0.9 ms non-STN at b256 —
hypothesis: the banded sampler's (B,Ho,Wo,W) combined corner-weight
matrix, ~537 MB f32, is HBM-bound).

Run: python benchmarks/trace_stn.py [logdir]   (TPU env)
Writes benchmarks/trace_stn_summary.json.
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

    from crnn_ocr_tpu.models import CRNN, ModelConfig
    from crnn_ocr_tpu.ops import ctc
    from crnn_ocr_tpu.ops.preprocess import preprocess_batch

    B, W = 256, 128
    cfg = ModelConfig(
        num_classes=80, width=W, dtype="bfloat16", use_stn=True,
        use_pallas_rnn=True,
    )
    model = CRNN(cfg=cfg)
    x0 = jnp.zeros((B, cfg.height, W, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False,
    )

    @jax.jit
    def serve(variables, raw, heights, widths):
        x, w_new = preprocess_batch(
            raw, heights, widths, out_h=cfg.height, out_w=W
        )
        logits = model.apply(variables, x[..., None], train=False)
        probs = jax.nn.softmax(logits[:, cfg.ctc_time_slice :, :], axis=-1)
        T = probs.shape[1]
        il = jnp.clip(
            w_new // cfg.width_downsample - cfg.ctc_time_slice, 1, T
        )
        return ctc.ctc_greedy_decode(probs, il)

    def batch_of(seed):
        r = np.random.default_rng(seed)
        return (
            jnp.asarray(r.integers(0, 255, (B, 48, W + 64)).astype(np.uint8)),
            jnp.full((B,), 48, jnp.int32),
            jnp.asarray(
                r.integers(W // 2, W + 64, (B,)).astype(np.int32)
            ),
        )

    from crnn_ocr_tpu.utils.profiling import xplane_trace

    out = serve(variables, *batch_of(0))  # compile outside the trace
    np.asarray(out[0])

    with xplane_trace(logdir):
        last = None
        for i in range(1, 6):
            last = serve(variables, *batch_of(i))
        np.asarray(last[0])


def main() -> int:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xplane_stn_r2"
    capture(logdir)
    summary = summarize(logdir)
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "trace_stn_summary.json"
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
