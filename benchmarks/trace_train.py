"""Capture + summarize an xplane device trace of the B=128 train step.

The component ablations in profile_train.py can't explain the full step
(XLA fuses across component boundaries, and ablated programs optimize
differently); the trace is the ground truth for where device time goes.

Runs a handful of steps under jax.profiler, then parses the xplane proto
into a per-HLO-op table (top-K by self time) written to
benchmarks/trace_train_summary.json.

Run: python benchmarks/trace_train.py [logdir]   (TPU env)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(logdir: str) -> None:
    import jax
    import jax.numpy as jnp

    from crnn_ocr_tpu.models import ModelConfig
    from crnn_ocr_tpu.train import create_train_state, make_train_step
    from crnn_ocr_tpu.utils.profiling import xplane_trace

    B = 128
    cfg = ModelConfig(num_classes=80, width=128)
    T = cfg.time_steps() - cfg.ctc_time_slice
    rng = np.random.default_rng(0)
    state = create_train_state(cfg, jax.random.key(0), batch_size=B)
    step_fn = make_train_step(cfg, donate=False)
    key = jax.random.key(1)

    def batch_of(seed):
        r = np.random.default_rng(seed)
        return {
            "x": jnp.asarray(r.normal(size=(B, 32, 128)).astype(np.float32)),
            "the_labels": jnp.asarray(
                r.integers(0, 80, (B, 16)).astype(np.int32)
            ),
            "input_length": jnp.full((B,), T, jnp.int32),
            "label_length": jnp.full((B,), 16, jnp.int32),
        }

    # warm up / compile outside the trace
    state2, m = step_fn(state, batch_of(0), key)
    np.asarray(m["loss"])

    with xplane_trace(logdir):
        out = None
        for i in range(1, 6):
            state2, m = step_fn(state, batch_of(i), key)
            out = m["loss"]
        np.asarray(out)


def summarize(logdir: str, top: int = 25, steps: int = 5) -> dict:
    """Aggregate per-op self-times from the xplane proto (TPU device line)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    path = None
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                path = os.path.join(root, f)
    if path is None:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    ops: dict = {}
    total_ns = 0
    for plane in xs.planes:
        if "TPU" not in plane.name or "XLA Ops" not in json.dumps(
            [l.name for l in plane.lines]
        ):
            # keep only device planes that carry an XLA op line
            pass
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                ops[name] = ops.get(name, 0) + ev.duration_ps
                total_ns += ev.duration_ps
    table = sorted(ops.items(), key=lambda kv: -kv[1])[:top]
    summary = {
        "xplane": path,
        "device_total_ms_per_step": round(total_ns / 1e9 / steps, 3),
        "top_ops_ms_per_step": {
            k: round(v / 1e9 / steps, 4) for k, v in table
        },
    }
    return summary


def main() -> int:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xplane_train_r2"
    capture(logdir)
    summary = summarize(logdir)
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "trace_train_summary.json"
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
