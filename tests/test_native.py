"""Native C++ module tests: build, and bit-agreement with oracles."""

import numpy as np
import pytest

from crnn_ocr_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_editdistance_matches_python():
    from crnn_ocr_tpu.utils.metrics import _levenshtein_py

    rng = np.random.default_rng(0)
    for _ in range(50):
        na, nb = rng.integers(0, 20, 2)
        a = "".join(chr(97 + c) for c in rng.integers(0, 5, na))
        b = "".join(chr(97 + c) for c in rng.integers(0, 5, nb))
        assert native.editdistance(a, b) == _levenshtein_py(a, b), (a, b)


def test_editdistance_token_lists():
    assert native.editdistance(["a", "b"], ["a", "c", "b"]) == 1


def test_native_beam_matches_goldens(goldens):
    """C++ decoder must reproduce the tf_keras oracle bitwise (like the
    numpy exact decoder it mirrors)."""
    data = goldens("ctc_beam.npz")
    n = int(data["n_cases"])
    for i in range(n):
        probs = data[f"b{i}_probs"]
        in_len = data[f"b{i}_input_len"]
        bw = int(data[f"b{i}_beam_width"])
        tp = int(data[f"b{i}_top_paths"])
        want_logp = data[f"b{i}_logp"]
        paths, lens, scores = native.ctc_beam_decode_tf(
            probs, in_len, beam_width=bw, top_paths=tp
        )
        for p in range(tp):
            for b in range(probs.shape[0]):
                want = [v for v in data[f"b{i}_decoded{p}"][b] if v != -1]
                got = list(paths[b, p, : lens[b, p]])
                assert got == want, (i, p, b, got, want)
        np.testing.assert_allclose(scores, want_logp, rtol=1e-4, atol=1e-4)


def test_native_beam_matches_numpy_exact_random():
    """Differential: C++ vs numpy exact decoder on random inputs."""
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact

    rng = np.random.default_rng(1)
    for trial in range(10):
        B, T, C = 2, int(rng.integers(4, 14)), int(rng.integers(4, 9))
        probs = rng.random((B, T, C)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        in_len = rng.integers(2, T + 1, (B,)).astype(np.int32)
        bw, tp = int(rng.integers(2, 6)), 2
        dec, sc = ctc_beam_search_decode_exact(
            probs, in_len, beam_width=bw, top_paths=tp
        )
        paths, lens, scores = native.ctc_beam_decode_tf(
            probs, in_len, beam_width=bw, top_paths=tp
        )
        for p in range(tp):
            for b in range(B):
                want = [v for v in dec[p][b] if v != -1]
                got = list(paths[b, p, : lens[b, p]])
                assert got == want, (trial, p, b, got, want)
        np.testing.assert_allclose(scores, sc, rtol=1e-3, atol=1e-3)


def test_native_preprocess_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from crnn_ocr_tpu.ops.preprocess import preprocess_host

    rng = np.random.default_rng(2)
    for h, w in [(48, 200), (32, 128), (64, 90)]:
        img = rng.integers(0, 255, (h, w)).astype(np.uint8)
        got, w_new = native.preprocess_line(img, 32, 128, normalize=True)
        want = preprocess_host(img, 32, 128, normalize=True)
        np.testing.assert_allclose(got, want, atol=2e-2)
