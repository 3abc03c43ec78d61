"""Per-character greedy alignment (ops/ctc.py::ctc_greedy_alignment).

Beyond-reference feature (the reference returns decoded text only): each
emitted character reports the frame extent of its argmax run and the peak
probability inside it. The contract tested here:

  * the emitted label sequence is EXACTLY ``ctc_greedy_decode``'s output;
  * starts/ends bound the maximal consecutive same-argmax run of VALID
    frames (runs never cross the input_length boundary);
  * conf = max softmax probability over the run;
all checked against an independent numpy reference, plus crafted edges.
"""

import numpy as np

from crnn_ocr_tpu.ops import ctc


def _ref_alignment(y, il):
    """Trivially-correct per-row python reference."""
    B, T, C = y.shape
    blank = C - 1
    out = []
    for b in range(B):
        best = y[b].argmax(-1)
        pmax = y[b].max(-1)
        rows = []
        t = 0
        while t < int(il[b]):
            lab = best[t]
            t0 = t
            while t + 1 < int(il[b]) and best[t + 1] == lab:
                t += 1
            if lab != blank:
                rows.append((int(lab), t0, t, float(pmax[t0 : t + 1].max())))
            t += 1
        out.append(rows)
    return out


def _rand_probs(rng, B, T, C, peaky=False):
    logits = rng.normal(size=(B, T, C)).astype(np.float32)
    if peaky:
        # low-entropy rows with frequent argmax repeats (runs > 1 frame)
        hot = rng.integers(0, C, (B, T, 1)) == np.arange(C)
        logits = 3.0 * hot.astype(np.float32) + 0.1 * logits
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_alignment_matches_numpy_reference_fuzz():
    rng = np.random.default_rng(11)
    for trial in range(8):
        B, T, C = 6, 23, int(rng.integers(3, 8))
        y = _rand_probs(rng, B, T, C, peaky=trial % 2 == 1)
        il = rng.integers(1, T + 1, B).astype(np.int32)
        labels, starts, ends, confs = map(
            np.asarray, ctc.ctc_greedy_alignment(y, il)
        )
        ref = _ref_alignment(y, il)
        for b in range(B):
            L = len(ref[b])
            assert (labels[b, L:] == -1).all()
            for j, (lab, t0, t1, cf) in enumerate(ref[b]):
                assert labels[b, j] == lab
                assert starts[b, j] == t0
                assert ends[b, j] == t1
                np.testing.assert_allclose(confs[b, j], cf, rtol=1e-6)


def test_alignment_labels_equal_greedy_decode():
    rng = np.random.default_rng(5)
    y = _rand_probs(rng, 16, 31, 5, peaky=True)
    il = rng.integers(1, 32, 16).astype(np.int32)
    labels, _, _, _ = map(np.asarray, ctc.ctc_greedy_alignment(y, il))
    dec, _ = ctc.ctc_greedy_decode(y, il)
    dec = np.asarray(dec)
    w = max(labels.shape[1], dec.shape[1])

    def pad(x):
        return np.pad(x, ((0, 0), (0, w - x.shape[1])), constant_values=-1)

    np.testing.assert_array_equal(pad(labels), pad(dec))


def test_alignment_run_clamps_at_input_length():
    # argmax path: a a a a a (one long run), but il=3 -> run ends at frame 2
    C = 3  # labels {0,1}, blank=2
    T = 5
    y = np.full((1, T, C), 0.1, np.float32)
    y[0, :, 0] = 0.8
    y[0, 2, 0] = 0.9  # peak inside the valid prefix
    labels, starts, ends, confs = map(
        np.asarray, ctc.ctc_greedy_alignment(y, np.array([3]))
    )
    assert labels[0, 0] == 0 and labels[0, 1] == -1
    assert starts[0, 0] == 0 and ends[0, 0] == 2
    np.testing.assert_allclose(confs[0, 0], 0.9, rtol=1e-6)


def test_alignment_repeat_across_blank_two_runs():
    # a blank a -> two emissions with disjoint single-frame runs
    C = 3
    y = np.full((1, 3, C), 0.05, np.float32)
    y[0, 0, 0] = 0.9
    y[0, 1, 2] = 0.9
    y[0, 2, 0] = 0.7
    labels, starts, ends, confs = map(
        np.asarray, ctc.ctc_greedy_alignment(y, np.array([3]))
    )
    assert list(labels[0, :3]) == [0, 0, -1]
    assert (starts[0, 0], ends[0, 0]) == (0, 0)
    assert (starts[0, 1], ends[0, 1]) == (2, 2)
    np.testing.assert_allclose(confs[0, :2], [0.9, 0.7], rtol=1e-6)
