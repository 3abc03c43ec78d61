"""Train-step component profile: where do the 8 ms at B=128 go?

Ablations (same in-jit K-loop timing as run_all.py), flagship shapes
B=128, W=128 (T=30 post-slice), C=81:

  * full_f32        : default train step (ModelConfig dtype=float32)
  * full_bf16       : same with dtype=bfloat16 compute (Pallas RNN auto-on)
  * full_bf16_noprnn: bfloat16 with the XLA-scan RNN (Pallas RNN ablated)
  * fwd_loss        : loss_fn value only, no gradient (f32)
  * grad_no_ctc     : value_and_grad of the model with a mean-logits dummy
                      loss (isolates model fwd+bwd from the CTC)
  * ctc_pallas      : grad of the Pallas CTC loss alone wrt log_probs
  * ctc_scan        : grad of the scan CTC loss alone wrt log_probs

Writes benchmarks/profile_train.json.
Run: python benchmarks/profile_train.py   (TPU env)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_all import _device_time  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from crnn_ocr_tpu.models import ModelConfig
    from crnn_ocr_tpu.train import create_train_state, make_train_step
    from crnn_ocr_tpu.train.step import ctc_loss_vec

    B, K = 128, 16
    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "batch": B, "parts_ms": {}}

    def t(name, fn, const, varying, K=K):
        s = _device_time(fn, const, varying, K=K)
        # sub-RTT-jitter programs can measure slightly negative after the
        # RTT subtraction; clamp to 0 (means: below the ~0.1 ms noise floor)
        results["parts_ms"][name] = round(max(1e3 * s, 0.0), 3)
        print(f"{name:<15} {1e3 * s:8.3f} ms", file=sys.stderr)

    base = ModelConfig(num_classes=80, width=128)
    T = base.time_steps() - base.ctc_time_slice
    xs = jnp.asarray(rng.normal(size=(K, B, 32, 128)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 80, (K, B, 16)).astype(np.int32))
    key = jax.random.key(1)

    def batch_of(x_, l_):
        return {
            "x": x_,
            "the_labels": l_,
            "input_length": jnp.full((B,), T, jnp.int32),
            "label_length": jnp.full((B,), 16, jnp.int32),
        }

    def run_full(name, cfg):
        state = create_train_state(cfg, jax.random.key(0), batch_size=B)
        step_fn = make_train_step(cfg, donate=False)
        # checksum metrics AND updated state (value-only would DCE the
        # optimizer update; see run_all.py train_once)
        def once(s_, x_, l_):
            new_state, m = step_fn(s_, batch_of(x_, l_), key)
            return m, new_state.params, new_state.opt_state

        t(name, once, (state,), (xs, labels))
        return state

    state = run_full("full_f32", base)
    run_full("full_bf16", dataclasses.replace(base, dtype="bfloat16"))
    # use_pallas_rnn=None auto-resolves to ON for TPU runs, so the real
    # ablation is turning it OFF (the scan path)
    run_full("full_bf16_noprnn", dataclasses.replace(
        base, dtype="bfloat16", use_pallas_rnn=False))

    # forward + loss only (no grad), f32 default
    def fwd_loss(s_, x_, l_):
        b = batch_of(x_, l_)
        logits, _ = s_.apply_fn(
            {"params": s_.params, "batch_stats": s_.batch_stats},
            b["x"][..., None], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )
        return ctc_loss_vec(
            logits, b["the_labels"], b["input_length"], b["label_length"],
            use_pallas=True,
        ).mean()

    t("fwd_loss", fwd_loss, (state,), (xs, labels))

    # model fwd+bwd without CTC (dummy loss)
    def grad_no_ctc(s_, x_, l_):
        def lf(p):
            logits, _ = s_.apply_fn(
                {"params": p, "batch_stats": s_.batch_stats},
                x_[..., None], train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(2)},
            )
            return jnp.mean(logits * logits)

        # keep BOTH outputs live — returning only the value lets XLA
        # dead-code-eliminate the entire backward pass (same artifact as
        # the round-1 train_step figure)
        return jax.value_and_grad(lf)(s_.params)

    t("grad_no_ctc", grad_no_ctc, (state,), (xs, labels))

    # CTC alone, fwd+bwd wrt log_probs, pallas vs scan
    lps = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(K, B, T, 81)).astype(np.float32)), -1
    )

    def ctc_only(use_pallas):
        def f(lp_, l_):
            def lf(lp):
                return ctc_loss_vec(
                    lp, l_, jnp.full((B,), T, jnp.int32),
                    jnp.full((B,), 16, jnp.int32), ctc_time_slice=0,
                    use_pallas=use_pallas,
                ).mean()

            return jax.value_and_grad(lf)(lp_)[0]

        return f

    t("ctc_pallas", ctc_only(True), (), (lps, labels))
    t("ctc_scan", ctc_only(False), (), (lps, labels))

    out = os.path.join(os.path.dirname(__file__), "profile_train.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
