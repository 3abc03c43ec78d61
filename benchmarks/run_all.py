"""Extended benchmark sweep over the BASELINE.json config matrix.

bench.py stays the driver's single-line contract (configs 1-2, greedy
serving); this sweep adds the remaining configs and writes
benchmarks/results.json:

  * greedy serving at several batch sizes + width buckets (configs 1-2)
  * STN-enabled variant (config 3)
  * on-device beam search width 10 with confidences (config 4)
  * training step throughput, single chip + DP mesh if >1 device (config 5)

Run: python benchmarks/run_all.py  (on the TPU env; slow first compile)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_RTT = None


def _tunnel_rtt():
    """Per-call tunnel round-trip (subtracted from device timings)."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1)
        np.asarray(f(jnp.ones(8)))
        t0 = time.perf_counter()
        np.asarray(f(jnp.ones(8)))
        _RTT = time.perf_counter() - t0
    return _RTT


def _device_time(step_fn, const_args, varying_stacked, K=8, trials=3):
    """True device time per step: K steps inside one jit (lax.scan) over K
    genuinely DISTINCT inputs (constant loop bodies get hoisted by XLA and
    read as fake sub-ms steps), scalar-checksum output, single host sync,
    tunnel RTT subtracted.

    ``step_fn(*const_args, *varying)`` must return a pytree of arrays;
    ``varying_stacked`` is a tuple of (K, ...) arrays scanned over.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(const_args, varying_stacked):
        def body(c, xs):
            out = step_fn(*const_args, *xs)
            s = sum(
                jnp.sum(x).astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(out)
            )
            return c + s, None

        tot, _ = jax.lax.scan(body, jnp.float32(0), varying_stacked)
        return tot

    np.asarray(run(const_args, varying_stacked))  # compile
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(run(const_args, varying_stacked))
        times.append(time.perf_counter() - t0)
    # min, not median: tunnel RTT jitter and host scheduling hiccups are
    # strictly ADDITIVE noise (a 20 ms host stall during one trial inflates
    # that trial by 20/K ms/step); the fastest trial is the truest
    return (float(np.min(times)) - _tunnel_rtt()) / K



def _write_results(results, merge):
    """Write benchmarks/results.json; merge preserves other configs when
    this was a BENCH_ONLY-filtered run (the serving-only early exit used
    to print-and-return WITHOUT writing, silently dropping its numbers)."""
    out = os.path.join(os.path.dirname(__file__), "results.json")
    if merge:
        try:
            with open(out) as f:
                prev = json.load(f)
            prev["configs"].update(results["configs"])
            results = prev
        except FileNotFoundError:
            pass
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


def _run_fragile_in_subprocesses():
    """Run the large-beam configs in child processes.

    They hit unrecoverable TPU InvalidArgument errors when compiled after
    many other programs in one process (each passes standalone;
    jax.clear_caches does not recover a poisoned client). Only one process
    may hold the TPU grant, so the children must run BEFORE this process
    initializes its own backend — call this before any jax device use.
    Children merge their rows into results.json themselves.
    """
    import subprocess

    for tag in ("beamBig", "beamSharp"):
        env = dict(os.environ, BENCH_ONLY=tag)
        print(f"[sweep] {tag} -> subprocess", file=sys.stderr)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=2400,
            )
        except subprocess.TimeoutExpired:
            print(f"[sweep] {tag} subprocess TIMED OUT", file=sys.stderr)
            continue
        for line in r.stderr.splitlines():
            if "{" in line or "FAILED" in line:
                print(line, file=sys.stderr)
        if r.returncode != 0:
            print(f"[sweep] {tag} subprocess rc={r.returncode}",
                  file=sys.stderr)


def main() -> int:
    if os.environ.get("BENCH_ONLY") is None:
        _run_fragile_in_subprocesses()

    import jax
    import jax.numpy as jnp

    from crnn_ocr_tpu.models import CRNN, ModelConfig
    from crnn_ocr_tpu.ops import ctc
    from crnn_ocr_tpu.ops.preprocess import preprocess_batch

    results = {"device": str(jax.devices()[0]), "configs": {}}
    rng = np.random.default_rng(0)

    def serving_bench(name, B, width, use_stn=False, beam=None,
                      use_pallas=False, K=32, beam_exact=True, n_units=256,
                      rnn_cell="gru"):
        cfg = ModelConfig(
            num_classes=80, width=width, dtype="bfloat16", use_stn=use_stn,
            use_pallas_rnn=use_pallas, n_units=n_units, rnn_cell=rnn_cell,
        )
        model = CRNN(cfg=cfg)
        raw = rng.integers(
            0, 255, size=(K, B, 48, width + 64)
        ).astype(np.uint8)
        heights = np.full((K, B), 48, np.int32)
        widths = rng.integers(
            width // 2, width + 64, size=(K, B)
        ).astype(np.int32)
        x0 = jnp.zeros((B, cfg.height, width, 1), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x0, train=False,
        )

        def serve(variables, raw, heights, widths):
            x, w_new = preprocess_batch(
                raw, heights, widths, out_h=cfg.height, out_w=width
            )
            logits = model.apply(variables, x[..., None], train=False)
            probs = jax.nn.softmax(
                logits[:, cfg.ctc_time_slice :, :], axis=-1
            )
            T = probs.shape[1]
            il = jnp.clip(
                w_new // cfg.width_downsample - cfg.ctc_time_slice, 1, T
            )
            if beam:
                if beam_exact:
                    from crnn_ocr_tpu.ops.ctc_beam_device import (
                        ctc_beam_search_decode_tf,
                    )

                    return ctc_beam_search_decode_tf(
                        probs, il, beam_width=beam, top_paths=1
                    )
                return ctc.ctc_beam_search_decode(
                    probs, il, beam_width=beam, top_paths=1
                )
            return ctc.ctc_greedy_decode(probs, il)

        varying = tuple(map(jax.device_put, (raw, heights, widths)))
        step = _device_time(serve, (variables,), varying, K=K)
        rec = {
            "batch": B,
            "width": width,
            "lines_per_sec": round(B / step, 1),
            "batch_ms": round(1e3 * step, 3),
        }
        results["configs"][name] = rec
        print(name, rec, file=sys.stderr)

    def serving_bench_safe(name, *a, **kw):
        # One config must not kill the sweep. The large-batch beam config
        # has hit transient TPU InvalidArgument errors when many compiled
        # programs accumulate in-process (it passes standalone); clearing
        # the executable cache between configs and recording failures
        # keeps the committed results file complete and honest.
        try:
            serving_bench(name, *a, **kw)
        except Exception as e:  # pragma: no cover - device-dependent
            results["configs"][name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name} FAILED: {e}", file=sys.stderr)
            jax.clear_caches()

    only = os.environ.get("BENCH_ONLY")

    def want(name):
        return only is None or only in name

    # K (scan length) sized so device time >> tunnel RTT jitter (~20 ms)
    if want("greedy_b256_w128"):
        serving_bench("greedy_b256_w128", 256, 128, use_pallas=True)
    if want("greedy_b32_w128"):
        serving_bench("greedy_b32_w128", 32, 128, use_pallas=True, K=128)
    if want("greedy_b256_w256"):
        serving_bench("greedy_b256_w256", 256, 256, use_pallas=True)
    if want("units512"):
        # scaled model family (7.1M params): MXU-width check at n_units=512
        serving_bench("greedy_b256_w128_units512", 256, 128,
                      use_pallas=True, n_units=512)
    if want("lstm"):
        # the reference's other RNN family (C4 GRU/LSTM choice): Pallas
        # fused LSTM cell at serving shapes
        serving_bench("greedy_b256_w128_lstm", 256, 128, use_pallas=True,
                      rnn_cell="lstm")
    if want("stn"):
        serving_bench("stn_greedy_b256_w128", 256, 128, use_stn=True,
                      use_pallas=True)
    if want("beam"):
        # default beam path = on-device TF-exact decoder (ctc_beam_device)
        serving_bench("beam10_b32_w128", 32, 128, beam=10, use_pallas=True,
                      K=64)
    if want("beamLegacy"):
        # the admissible vectorized search (prefix-buffer formulation)
        serving_bench("beam10_legacy_b32_w128", 32, 128, beam=10,
                      use_pallas=True, K=64, beam_exact=False)
    if only == "beamBig":  # fragile: exact tag only (else a BENCH_ONLY=beam
        # filter pulls it in-process after other compiles -> known
        # InvalidArgument poisoning, and the crash loses the whole write)
        # batch-amortized beam serving (per-step decoder overhead is batch-
        # independent; production batches are closer to 256 than 32).
        # Unfiltered sweeps run this in a child process BEFORE the parent
        # takes the TPU grant (see top of main).
        serving_bench_safe("beam10_b256_w128", 256, 128, beam=10,
                           use_pallas=True, K=16)
    if only == "beamSharp":  # fragile: exact tag only (see beamBig)
        # Decoder-only on TRAINED-model-like posteriors (one ~97% class per
        # frame). The serving_bench beam configs feed the decoder an
        # UNTRAINED model's near-uniform outputs — the worst case for the
        # exact search (sequential-gating fallback fires constantly), not
        # the deployment regime. Reported separately, clearly labeled.
        import jax.numpy as jnp2

        from crnn_ocr_tpu.ops.ctc_beam_device import (
            ctc_beam_search_decode_tf,
        )

        for B, K in ((32, 64), (256, 16)):
            T, C = 30, 81
            peak = rng.integers(0, C, size=(K, B, T))
            logits = rng.normal(size=(K, B, T, C)).astype(np.float32)
            logits[
                np.arange(K)[:, None, None], np.arange(B)[None, :, None],
                np.arange(T)[None, None, :], peak,
            ] += 6.0
            probs = jax.device_put(
                np.asarray(jax.nn.softmax(jnp2.asarray(logits), axis=-1))
            )
            il = jax.device_put(np.full((K, B), T, np.int32))
            try:
                step = _device_time(
                    lambda p, l: ctc_beam_search_decode_tf(
                        p, l, beam_width=10, top_paths=1
                    ),
                    (), (probs, il), K=K,
                )
                rec = {"batch": B, "width": None,
                       "lines_per_sec": round(B / step, 1),
                       "batch_ms": round(1e3 * step, 3),
                       "note": "decoder-only, peaked (trained-model-like)"
                               " posteriors"}
            except Exception as e:  # pragma: no cover - device-dependent
                rec = {"error": f"{type(e).__name__}: {e}"}
                jax.clear_caches()
            results["configs"][f"beam10_decoder_sharp_b{B}"] = rec
            print(f"beam10_decoder_sharp_b{B}", rec, file=sys.stderr)
    if want("noPallas"):
        serving_bench("greedy_b256_w128_noPallas", 256, 128, use_pallas=False)
    if want("editdistance"):
        # on-device eval CER: batched anti-diagonal Levenshtein vs the host
        # per-pair DP loop (the reference's editdistance package model).
        from crnn_ocr_tpu.ops.editdistance import batched_levenshtein
        from crnn_ocr_tpu.utils import metrics as metrics_lib

        B, La, Lb, K = 1024, 30, 16, 32
        a = rng.integers(0, 60, (K, B, La)).astype(np.int32)
        b = rng.integers(0, 60, (K, B, Lb)).astype(np.int32)
        la = rng.integers(1, La + 1, (K, B)).astype(np.int32)
        lb = rng.integers(1, Lb + 1, (K, B)).astype(np.int32)
        varying = tuple(map(jax.device_put, (a, la, b, lb)))
        step = _device_time(batched_levenshtein, (), varying, K=K)
        t0 = time.perf_counter()
        for i in range(B):
            metrics_lib.levenshtein(
                list(a[0, i, : la[0, i]]), list(b[0, i, : lb[0, i]])
            )
        host_s = time.perf_counter() - t0
        rec = {
            "batch": B,
            "pairs_per_sec": round(B / step, 1),
            "batch_ms": round(1e3 * step, 3),
            "host_batch_ms": round(1e3 * host_s, 3),
            "device_speedup": round(host_s / step, 1),
        }
        results["configs"]["editdistance_b1024"] = rec
        print("editdistance_b1024", rec, file=sys.stderr)

    # config 5: training step throughput
    if only is not None and "train" not in only:
        _write_results(results, merge=True)
        return 0
    import dataclasses

    from crnn_ocr_tpu.train import create_train_state, make_train_step

    B, K = 128, 16
    base_cfg = ModelConfig(num_classes=80, width=128)
    T = base_cfg.time_steps() - base_cfg.ctc_time_slice
    xs = jnp.asarray(rng.normal(size=(K, B, 32, 128)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 80, (K, B, 16)).astype(np.int32))
    key = jax.random.key(1)

    def train_bench(name, cfg):
        state = create_train_state(cfg, jax.random.key(0), batch_size=B)
        step_fn = make_train_step(cfg, donate=False)

        def train_once(state_, x_, labels_):
            batch_ = {
                "x": x_,
                "the_labels": labels_,
                "input_length": jnp.full((B,), T, jnp.int32),
                "label_length": jnp.full((B,), 16, jnp.int32),
            }
            new_state, m = step_fn(state_, batch_, key)
            # Checksum the UPDATED STATE too, or XLA dead-code-eliminates
            # the whole optimizer update (and anything only it consumes)
            # from the timed program — the round-1 "1.53 ms" figure was
            # exactly that artifact (a value-only ablation whose backward
            # pass was DCE'd).
            return m, new_state.params, new_state.opt_state

        step = _device_time(train_once, (state,), (xs, labels), K=K)
        results["configs"][name] = {
            "batch": B,
            "lines_per_sec": round(B / step, 1),
            "step_ms": round(1e3 * step, 3),
        }
        print(name, results["configs"][name], file=sys.stderr)

    # f32 = the parity default (Keras trains f32); bf16 = the documented
    # perf mode (same convergence on the synthetic/fonts tasks).
    train_bench("train_step_b128", base_cfg)
    train_bench(
        "train_step_b128_bf16",
        dataclasses.replace(base_cfg, dtype="bfloat16"),
    )
    # A/B for the train-mode fused Pallas stem (auto-on at this shape)
    train_bench(
        "train_step_b128_noFusedStem",
        dataclasses.replace(base_cfg, use_fused_stem=False),
    )

    # Always merge: subprocess-delegated configs (beamBig/beamSharp) wrote
    # their rows into results.json before this final write.
    _write_results(results, merge=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
