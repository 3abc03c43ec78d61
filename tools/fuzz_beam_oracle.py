"""Differential fuzz: native C++ TF-exact beam decoder vs the LIVE
tf_keras oracle on random configs (B/T/C/beam/top_paths/peakiness).
Run: python tools/fuzz_beam_oracle.py   (expects 0 mismatches; 300 trials)
"""

import os
os.environ["CUDA_VISIBLE_DEVICES"]="-1"; os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL","3")
import numpy as np
from tf_keras import backend as K
from crnn_ocr_tpu import native

rng = np.random.default_rng(20260816)
bad = 0
N = 300
for trial in range(N):
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
    paths, lens, scores = native.ctc_beam_decode_tf(probs, il, beam_width=bw, top_paths=tp)
    for p in range(tp):
        for b in range(B):
            want = [int(v) for v in np.asarray(dec_o[p])[b] if v != -1]
            got = list(map(int, paths[b, p, :lens[b, p]]))
            if got != want:
                bad += 1
                print("PATH MISMATCH", trial, p, b, got, want)
    if not np.allclose(scores, np.asarray(lp_o), rtol=5e-4, atol=5e-4):
        bad += 1
        print("SCORE MISMATCH", trial, scores.ravel()[:4], np.asarray(lp_o).ravel()[:4])
    if bad > 5:
        break
print(f"fuzz done: {N} trials, {bad} mismatches")
