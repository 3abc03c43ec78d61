"""Forced (constrained Viterbi) alignment — ops/ctc.py::ctc_forced_alignment.

Beyond-reference feature: per-character frame spans for an ARBITRARY label
sequence (beam output, ground truth, ...), not just the greedy argmax path.
Contract tested here:

  * spans match an independent numpy max-product DP with the same
    deterministic tie rules (stay > diagonal > skip; end tie -> final blank);
  * infeasible (labels need more frames than input_length) -> feasible=False
    and all spans -1;
  * on the greedy-decoded labels of peaked inputs the spans agree with
    ``ctc_greedy_alignment``'s argmax runs;
  * Predictor beam alignments join to the beam text (see test_predictor.py).
"""

import numpy as np

from crnn_ocr_tpu.ops import ctc

NEG = -1e30


def _np_forced(y, il, labels, ll):
    """Per-row numpy Viterbi reference mirroring ctc_forced_alignment's
    tie rules exactly (f32 arithmetic, stay>diag>skip, end tie->blank)."""
    B, T, C = y.shape
    blank = C - 1
    logp = np.log(y.astype(np.float32) + np.float32(1e-7)).astype(np.float32)
    starts = np.full((B, labels.shape[1]), -1, np.int32)
    ends = np.full((B, labels.shape[1]), -1, np.int32)
    confs = np.zeros((B, labels.shape[1]), np.float32)
    feas = np.zeros((B,), bool)
    for b in range(B):
        L = int(ll[b])
        lab = [int(v) for v in labels[b, :L]]
        ext = [blank]
        for v in lab:
            ext += [v, blank]
        S = len(ext)
        Tv = int(il[b])
        lp = logp[b]
        delta = np.full((Tv, S), NEG, np.float32)
        bp = np.zeros((Tv, S), np.int32)
        delta[0, 0] = lp[0, ext[0]]
        if L > 0:
            delta[0, 1] = lp[0, ext[1]]
        for t in range(1, Tv):
            for s in range(S):
                best, step = delta[t - 1, s], 0
                if s >= 1 and delta[t - 1, s - 1] > best:
                    best, step = delta[t - 1, s - 1], 1
                if (
                    s >= 2
                    and ext[s] != blank
                    and ext[s] != ext[s - 2]
                    and delta[t - 1, s - 2] > best
                ):
                    best, step = delta[t - 1, s - 2], 2
                delta[t, s] = np.float32(best + lp[t, ext[s]])
                bp[t, s] = step
        d_last = delta[Tv - 1, S - 1]
        d_prev = delta[Tv - 1, S - 2] if L > 0 else NEG
        if max(d_last, d_prev) <= NEG / 2:
            continue  # infeasible
        feas[b] = True
        cur = S - 2 if d_prev > d_last else S - 1
        path = np.zeros((Tv,), np.int32)
        for t in range(Tv - 1, -1, -1):
            path[t] = cur
            if t > 0:
                cur -= bp[t, cur]
        for j in range(L):
            s = 2 * j + 1
            frames = np.nonzero(path == s)[0]
            if len(frames):
                starts[b, j] = frames[0]
                ends[b, j] = frames[-1]
                confs[b, j] = y[b, frames, lab[j]].max()
    return starts, ends, confs, feas


def _rand_probs(rng, B, T, C, peaky=False):
    logits = rng.normal(size=(B, T, C)).astype(np.float32)
    if peaky:
        hot = rng.integers(0, C, (B, T, 1)) == np.arange(C)
        logits = 3.0 * hot.astype(np.float32) + 0.1 * logits
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_forced_alignment_matches_numpy_reference_fuzz():
    rng = np.random.default_rng(23)
    for trial in range(8):
        B, T, C = 5, 19, int(rng.integers(4, 8))
        y = _rand_probs(rng, B, T, C, peaky=trial % 2 == 1)
        il = rng.integers(4, T + 1, B).astype(np.int32)
        # random labels (may include adjacent repeats and infeasible rows)
        L = 7
        labels = rng.integers(0, C - 1, (B, L)).astype(np.int32)
        ll = rng.integers(0, L + 1, B).astype(np.int32)
        got = [
            np.asarray(a)
            for a in ctc.ctc_forced_alignment(y, il, labels, ll)
        ]
        ref = _np_forced(y, il, labels, ll)
        np.testing.assert_array_equal(got[3], ref[3], err_msg="feasible")
        np.testing.assert_array_equal(got[0], ref[0], err_msg="starts")
        np.testing.assert_array_equal(got[1], ref[1], err_msg="ends")
        np.testing.assert_allclose(got[2], ref[2], rtol=1e-6, atol=1e-7)


def test_forced_alignment_infeasible_and_empty():
    C, T = 4, 5
    rng = np.random.default_rng(3)
    y = _rand_probs(rng, 2, T, C)
    # row 0: 4 labels with 3 adjacent repeats -> needs 7 > 5 frames
    labels = np.array([[1, 1, 1, 1], [0, 0, 0, 0]], np.int32)
    ll = np.array([4, 0], np.int32)
    il = np.array([T, T], np.int32)
    starts, ends, confs, feas = map(
        np.asarray, ctc.ctc_forced_alignment(y, il, labels, ll)
    )
    assert not feas[0]
    assert (starts[0] == -1).all() and (ends[0] == -1).all()
    assert feas[1]  # empty label sequence is always alignable
    assert (starts[1] == -1).all()
    assert (confs == 0).all()


def test_forced_alignment_agrees_with_greedy_runs_on_peaked():
    """Force-aligning the greedy-decoded labels of peaked inputs yields
    spans that cover each greedy argmax run's frames (blank frames between
    runs are strongly blank, so the Viterbi path matches the runs)."""
    rng = np.random.default_rng(7)
    B, T, C = 8, 25, 6
    # very peaked: one dominant class per frame
    hot = rng.integers(0, C, (B, T, 1)) == np.arange(C)
    logits = 8.0 * hot.astype(np.float32)
    y = np.exp(logits)
    y /= y.sum(-1, keepdims=True)
    il = np.full((B,), T, np.int32)

    g_lab, g_st, g_en, _ = map(
        np.asarray, ctc.ctc_greedy_alignment(y, il)
    )
    dec, _ = ctc.ctc_greedy_decode(y, il)
    dec = np.asarray(dec)
    lab_in = np.maximum(dec, 0)
    ll = (dec >= 0).sum(1).astype(np.int32)
    starts, ends, confs, feas = map(
        np.asarray, ctc.ctc_forced_alignment(y, il, lab_in, ll)
    )
    assert feas.all()
    for b in range(B):
        n = int(ll[b])
        # same character count, identical spans (dominant-class regime)
        assert (g_lab[b, :n] == lab_in[b, :n]).all()
        np.testing.assert_array_equal(starts[b, :n], g_st[b, :n])
        np.testing.assert_array_equal(ends[b, :n], g_en[b, :n])
        # spans ordered and disjoint
        for j in range(1, n):
            assert starts[b, j] > ends[b, j - 1]


def test_forced_alignment_crafted_double_letter():
    """'aa' needs an interposed blank: spans must be disjoint with the
    blank frame between them."""
    C = 3  # labels {0,1}, blank=2
    y = np.full((1, 5, C), 0.02, np.float32)
    y[0, 0, 0] = 0.9
    y[0, 1, 0] = 0.8
    y[0, 2, 2] = 0.9  # blank bridge
    y[0, 3, 0] = 0.85
    y[0, 4, 0] = 0.7
    labels = np.array([[0, 0]], np.int32)
    ll = np.array([2], np.int32)
    starts, ends, confs, feas = map(
        np.asarray,
        ctc.ctc_forced_alignment(y, np.array([5], np.int32), labels, ll),
    )
    assert feas[0]
    assert (starts[0, 0], ends[0, 0]) == (0, 1)
    assert (starts[0, 1], ends[0, 1]) == (3, 4)
    np.testing.assert_allclose(confs[0], [0.9, 0.85], rtol=1e-6)
