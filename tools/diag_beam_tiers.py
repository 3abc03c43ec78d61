"""Measure the exact beam decoder's dispatch-tier hit rates.

The on-device TF-exact beam search (ops/ctc_beam_device.py) dispatches each
frame through three tiers: a cheap syntactic proof, an eviction-bound proof,
and the exact sequential-gating pass. Dispatch is batch-global by default
(``DISPATCH_BLOCK=0``); this tool quantifies per-sample, per-frame, and
hypothetical per-block tier admission on peaked (deployment) vs near-uniform
(worst-case) posteriors — the data behind the dispatch-granularity decision
recorded in the decoder.

Run on CPU (predicate math is backend-independent):
    PYTHONPATH=/root/repo python tools/diag_beam_tiers.py
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_tier_stats  # noqa: E402


def make_posteriors(kind: str, B: int, T: int, C: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, T, C)).astype(np.float32)
    if kind == "peaked":
        peak = rng.integers(0, C, size=(B, T))
        logits[np.arange(B)[:, None], np.arange(T)[None, :], peak] += 6.0
    elif kind == "peaked_blanky":
        # trained-OCR-like: ~half the frames peak on blank (C-1)
        peak = rng.integers(0, C, size=(B, T))
        peak = np.where(rng.random((B, T)) < 0.5, C - 1, peak)
        logits[np.arange(B)[:, None], np.arange(T)[None, :], peak] += 6.0
    return np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))


def report(kind: str, B: int = 32, T: int = 30, C: int = 81, W: int = 10):
    probs = make_posteriors(kind, B, T, C)
    il = np.full((B,), T, np.int32)
    (cheap, bound, ok_a, ok_c, ok_zc,
     bsel, cheap_safe, ex_open, ex_zeroed) = jax.device_get(
        ctc_beam_tier_stats(jnp.asarray(probs), jnp.asarray(il), W)
    )
    fast = cheap | bound  # tier-2 admits everything tier-1 admits
    frame_cheap = cheap.all(axis=1)  # (T,) batch-global tier-1 pass
    frame_fast = fast.all(axis=1)    # (T,) batch-global tier-1|2 pass
    print(f"== {kind}  B={B} T={T} C={C} W={W}")
    print(f"  per-sample-frame admission: tier1 {cheap.mean():.4f}  "
          f"tier1|2 {fast.mean():.4f}")
    print(f"  component fail rates: ok_a {(~ok_a).mean():.4f}  "
          f"ok_c {(~ok_c).mean():.4f}  zero_cheap {(~ok_zc).mean():.4f}  "
          f"zero_bound(beyond cheap) "
          f"{(~bound & ok_a & ok_c).mean():.4f}")
    print(f"  batch-global frames: tier1 {frame_cheap.mean():.3f}  "
          f"tier1|2(fast) {frame_fast.mean():.3f}  "
          f"slow {1 - frame_fast.mean():.3f}")
    # hypothetical per-block dispatch granularity (block=32): fraction of
    # (frame, block) conds that would resolve at each tier — the number
    # that decided AGAINST per-block dispatch (blocks are rarely clean
    # when any sample is dirty, so per-block multiplies latency-bound
    # slow-path invocations; DISPATCH_BLOCK=0 batch-global is the default)
    from crnn_ocr_tpu.ops.ctc_beam_device import DISPATCH_BLOCK
    blk = DISPATCH_BLOCK if DISPATCH_BLOCK > 0 else 32
    nblk = (B + blk - 1) // blk
    blk_cheap = np.array([
        cheap[:, s * blk:(s + 1) * blk].all(axis=1)
        for s in range(nblk)
    ])  # (nblk, T)
    blk_fast = np.array([
        fast[:, s * blk:(s + 1) * blk].all(axis=1)
        for s in range(nblk)
    ])
    print(f"  per-block({blk}) conds: tier1 "
          f"{blk_cheap.mean():.3f}  tier1|2(fast) {blk_fast.mean():.3f}  "
          f"slow {1 - blk_fast.mean():.3f}  (blocks={nblk})")
    # where do rejections cluster in time?
    rej = (~fast).sum(axis=1)
    print(f"  rejected samples per frame (first 30): {rej[:30].tolist()}")
    # exact-tier gate activity (how often the sequential pass actually
    # gates/zeroes anything — i.e. how hard the slow tier works)
    print(f"  exact-tier: mean open branches/frame "
          f"{ex_open.sum(axis=2).mean():.2f}  "
          f"zeroing events/frame {ex_zeroed.sum(axis=2).mean():.4f}  "
          f"branches w/ selected cands/frame {bsel.sum(axis=2).mean():.2f}")


if __name__ == "__main__":
    for kind in ("peaked", "peaked_blanky", "uniformish"):
        report(kind)
    report("peaked", B=256)
