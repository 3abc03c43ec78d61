"""On-chip A/B parity harness for the runtime fast paths (VERDICT r3 #4).

Kernel parity is unit-tested in interpret mode on CPU (tests/test_kernels.py)
— but compiled-Mosaic-vs-interpret or bf16 divergence only shows up on real
hardware. This tool runs IDENTICAL batches (fresh font-rendered text lines
through the bundled `fonts-small` pretrained) through each fast-path pair on
the CURRENT backend and reports decode agreement + probability deltas:

  rnn:   XLA scan RNN        vs  fused Pallas RNN       (f32, XLA stem)
  dtype: f32 compute         vs  bf16 compute           (XLA stem + scan)
  stem:  XLA stem            vs  fused Pallas stem      (bf16 — the serve
                                                         kernel's regime)
  prod:  f32 all-XLA         vs  bf16 + Pallas RNN + fused stem (the
                                 production serving configuration)

For the `prod` pair the TF-exact beam-10 decode agreement is also checked.
Writes benchmarks/ab_parity.json (committed artifact) and prints a summary.

Run on the TPU:  python tools/ab_parity.py --assert
    (recurring numerics gate, VERDICT r4 weak #7: exits nonzero unless
    every pair meets the thresholds below — greedy agreement >= 0.99,
    f32 Pallas RNN bit-identical, bounded max dprob, equal-or-better
    ground-truth accuracy within 2 lines. Re-run each round before the
    snapshot; see CLAUDE.md.)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from crnn_ocr_tpu.data.fontgen import FontTextlines
    from crnn_ocr_tpu.infer import load_pretrained
    from crnn_ocr_tpu.models import CRNN
    from crnn_ocr_tpu.ops import ctc
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf
    from crnn_ocr_tpu.ops.preprocess import pack_canvas, preprocess_batch

    B = int(os.environ.get("AB_BATCH", "128"))
    W = 128
    seed = int(os.environ.get("AB_SEED", "20260819"))

    pred = load_pretrained("fonts-small")
    cfg0 = pred.cfg
    variables = pred._vars
    codec = pred.codec

    # fresh realistic batch: trained-model posteriors are where decode
    # agreement is meaningful (random weights decode near-uniform noise)
    synth = FontTextlines()
    rng = np.random.default_rng(seed)
    images, texts = synth.sample_batch(B, rng)
    canvas, hs, ws = pack_canvas(images)
    x, w_new = preprocess_batch(
        jnp.asarray(canvas), jnp.asarray(hs), jnp.asarray(ws),
        out_h=cfg0.height, out_w=W,
    )
    x = np.asarray(x, np.float32)  # one fixed f32 input for every variant
    T = W // cfg0.width_downsample - cfg0.ctc_time_slice
    il = np.asarray(
        np.clip(np.asarray(w_new) // cfg0.width_downsample
                - cfg0.ctc_time_slice, 1, T),
        np.int32,
    )

    def variant(dtype, pallas_rnn, fused_stem):
        cfg = dataclasses.replace(
            cfg0, dtype=dtype, use_pallas_rnn=pallas_rnn,
            use_fused_stem=fused_stem,
        )
        model = CRNN(cfg=cfg)

        @jax.jit
        def fwd(xv):
            logits = model.apply(variables, xv[..., None], train=False)
            return jax.nn.softmax(
                logits[:, cfg.ctc_time_slice:, :].astype(jnp.float32),
                axis=-1,
            )

        probs = np.asarray(fwd(jnp.asarray(x)))
        dec, score = ctc.ctc_greedy_decode(jnp.asarray(probs),
                                           jnp.asarray(il))
        rows = ctc.trim_dense(np.asarray(dec))
        txts = [codec.labels_to_text(r) for r in rows]
        return probs, txts, np.asarray(score)

    print(f"[ab_parity] backend={jax.default_backend()} "
          f"device={jax.devices()[0]} B={B} W={W}", file=sys.stderr)

    configs = {
        # name: (dtype, pallas_rnn, fused_stem)
        "f32_xla": ("float32", False, False),
        "f32_pallas_rnn": ("float32", True, False),
        "bf16_xla": ("bfloat16", False, False),
        "bf16_fused_stem": ("bfloat16", False, True),
        "prod": ("bfloat16", True, True),
    }
    out = {}
    for name, (dt, pr, fs) in configs.items():
        out[name] = variant(dt, pr, fs)
        print(f"[ab_parity] ran {name}", file=sys.stderr)

    def compare(a, b):
        pa, ta, sa = out[a]
        pb, tb, sb = out[b]
        agree = sum(x == y for x, y in zip(ta, tb))
        return {
            "baseline": a,
            "variant": b,
            "greedy_decode_agree": f"{agree}/{B}",
            "greedy_agree_frac": agree / B,
            "max_abs_dprob": float(np.max(np.abs(pa - pb))),
            "mean_abs_dprob": float(np.mean(np.abs(pa - pb))),
            "max_abs_dscore": float(np.max(np.abs(sa - sb))),
        }

    results = {
        "rnn_scan_vs_pallas_f32": compare("f32_xla", "f32_pallas_rnn"),
        "dtype_f32_vs_bf16": compare("f32_xla", "bf16_xla"),
        "stem_xla_vs_fused_bf16": compare("bf16_xla", "bf16_fused_stem"),
        "prod_vs_f32_baseline": compare("f32_xla", "prod"),
    }

    # beam-10 agreement on the production pair (the serve --beam_width path)
    beams = {}
    for name in ("f32_xla", "prod"):
        probs = out[name][0]
        dec, logp = ctc_beam_search_decode_tf(
            jnp.asarray(probs), jnp.asarray(il), beam_width=10
        )
        beams[name] = (np.asarray(dec[0]), np.asarray(logp))
        print(f"[ab_parity] beam-10 {name}", file=sys.stderr)
    da, la = beams["f32_xla"]
    db, lb = beams["prod"]
    agree = int(np.sum(np.all(da == db, axis=1)))
    results["prod_beam10_vs_f32_baseline"] = {
        "beam10_decode_agree": f"{agree}/{B}",
        "beam10_agree_frac": agree / B,
        "max_abs_dlogp": float(
            np.max(np.abs(la[np.isfinite(la)] - lb[np.isfinite(lb)]))
        ),
    }

    # ground-truth accuracy per variant (all should read the rendered text)
    for name in configs:
        txts = out[name][1]
        acc = sum(t == g for t, g in zip(txts, texts)) / B
        results.setdefault("ground_truth_acc", {})[name] = acc

    payload = {
        "tool": "tools/ab_parity.py",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "batch": B,
        "width": W,
        "seed": seed,
        "model": "fonts-small",
        "results": results,
    }
    path = os.path.join(REPO, "benchmarks", "ab_parity.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))

    if "--assert" in sys.argv:
        failures = []

        def check(cond, msg):
            if not cond:
                failures.append(msg)

        r = results
        check(
            r["rnn_scan_vs_pallas_f32"]["max_abs_dprob"] == 0.0,
            "Pallas RNN no longer bit-identical to XLA scan at f32: "
            f"max dprob {r['rnn_scan_vs_pallas_f32']['max_abs_dprob']}",
        )
        for pair in ("rnn_scan_vs_pallas_f32", "dtype_f32_vs_bf16",
                     "stem_xla_vs_fused_bf16", "prod_vs_f32_baseline"):
            check(
                r[pair]["greedy_agree_frac"] >= 0.99,
                f"{pair}: greedy agreement "
                f"{r[pair]['greedy_decode_agree']} < 0.99",
            )
            check(
                r[pair]["max_abs_dprob"] <= 0.35,
                f"{pair}: max dprob {r[pair]['max_abs_dprob']:.3f} > 0.35",
            )
        check(
            r["prod_beam10_vs_f32_baseline"]["beam10_agree_frac"] >= 0.99,
            "prod beam-10 agreement "
            f"{r['prod_beam10_vs_f32_baseline']['beam10_decode_agree']} "
            "< 0.99",
        )
        acc = r["ground_truth_acc"]
        check(
            acc["prod"] >= acc["f32_xla"] - 2.0 / B,
            f"prod ground-truth acc {acc['prod']:.4f} below f32 baseline "
            f"{acc['f32_xla']:.4f} by more than 2 lines",
        )
        if failures:
            print("[ab_parity] ASSERT FAILED:", file=sys.stderr)
            for m in failures:
                print(f"  - {m}", file=sys.stderr)
            return 1
        print(
            "[ab_parity] ASSERT OK: all fast-path parity thresholds hold",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
