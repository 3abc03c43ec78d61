"""Differential fuzz: TF-exact beam decoders vs the LIVE tf_keras oracle
on random configs (B/T/C/beam/top_paths/peakiness).

Run: python tools/fuzz_beam_oracle.py            # native C++ decoder
     python tools/fuzz_beam_oracle.py --device   # on-device JAX decoder
                                                 # (ops/ctc_beam_device)
Expects 0 mismatches over 300 trials either way.

Caveat (both modes): inputs are the realistic fuzz distributions (uniform /
peaky posteriors). DEGENERATE near-ties (probs equal to ~1e-7) are excluded
by construction — there TF's own C++ float summation order decides the
ties, and no reimplementation (including the f64 host replica) reproduces
it; measured: host matches TF on only ~32% of 1e-6-noise uniform inputs.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CUDA_VISIBLE_DEVICES"]="-1"; os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL","3")
import numpy as np
from tf_keras import backend as K

DEVICE = "--device" in sys.argv
if DEVICE:
    import jax
    # fuzz on the CPU backend: 300 shape combos would serialize on the
    # one-at-a-time TPU grant and recompile remotely for each
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf
else:
    from crnn_ocr_tpu import native

def decode(probs, il, bw, tp):
    """-> (paths[b][p] -> list[int], scores (B, tp))."""
    B = probs.shape[0]
    if DEVICE:
        dec, sc = ctc_beam_search_decode_tf(
            jnp.asarray(probs), jnp.asarray(il), beam_width=bw, top_paths=tp)
        dec = np.asarray(dec)
        return (
            [[[int(v) for v in dec[p, b] if v != -1] for p in range(tp)]
             for b in range(B)],
            np.asarray(sc),
        )
    paths, lens, scores = native.ctc_beam_decode_tf(
        probs, il, beam_width=bw, top_paths=tp)
    return (
        [[list(map(int, paths[b, p, :lens[b, p]])) for p in range(tp)]
         for b in range(B)],
        scores,
    )

rng = np.random.default_rng(20260816)
bad = 0
N = 300
for trial in range(N):
    if trial and trial % 25 == 0:
        # Every random shape compiles fresh programs; hundreds of cached
        # executables in a TF+JAX process exhaust the address map budget
        # (observed: LLVM "Cannot allocate memory" then SIGSEGV mid-run).
        if DEVICE:
            jax.clear_caches()
        print(f"trial {trial}/{N}, {bad} mismatches", flush=True)
    B = int(rng.integers(1, 4)); T = int(rng.integers(2, 24)); C = int(rng.integers(3, 30))
    bw = int(rng.integers(1, 12)); tp = int(rng.integers(1, bw + 1))
    probs = rng.random((B, T, C)).astype(np.float32)
    if rng.random() < 0.5:
        probs = np.exp(rng.uniform(1, 7) * probs)
    probs /= probs.sum(-1, keepdims=True)
    il = rng.integers(1, T + 1, (B,)).astype(np.int32)
    # TF errors when the beam has fewer leaves than top_paths
    max_leaves = 1 + int(il.min()) * (C - 1)
    if tp > min(bw, max_leaves):
        continue
    dec_o, lp_o = K.ctc_decode(probs, il, greedy=False, beam_width=bw, top_paths=tp)
    paths, scores = decode(probs, il, bw, tp)
    for p in range(tp):
        for b in range(B):
            want = [int(v) for v in np.asarray(dec_o[p])[b] if v != -1]
            got = paths[b][p]
            if got != want:
                bad += 1
                print("PATH MISMATCH", trial, p, b, got, want)
    lp_o = np.asarray(lp_o)
    finite = np.isfinite(lp_o) & np.isfinite(scores)
    if not np.allclose(scores[finite], lp_o[finite], rtol=5e-4, atol=5e-4) \
            or not np.array_equal(np.isfinite(scores), np.isfinite(lp_o)):
        bad += 1
        print("SCORE MISMATCH", trial, scores.ravel()[:4], lp_o.ravel()[:4])
    if bad > 5:
        break
print(f"fuzz done: {N} trials, {bad} mismatches ({'device' if DEVICE else 'native'} decoder)")
