"""Generate golden parity targets from the tf_keras 2.21 oracle.

The reference (gasparian/CRNN-OCR-lite) delegates its CTC loss/decoding to
``K.ctc_batch_cost`` / ``K.ctc_decode`` (SURVEY.md §2.2 C12/C13). Those exact
APIs are installed locally, so we generate randomized golden outputs here once
and commit them as .npz; the pytest suite then checks the JAX implementations
against the goldens without importing TensorFlow (keeps tests fast/hermetic).

Run: python tools/gen_goldens.py
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def gen_ctc_cases(rng: np.random.Generator):
    """Randomized CTC loss/decode cases across shapes/degeneracies."""
    cases = []
    shapes = [
        # (B, T, C, Lmax)
        (1, 8, 5, 3),
        (4, 16, 12, 6),
        (3, 32, 30, 10),
        (2, 50, 80, 18),  # OCR-alphabet-sized
        (5, 20, 11, 8),
    ]
    for B, T, C, L in shapes:
        probs = rng.random((B, T, C)).astype(np.float32)
        # occasionally make distributions peaky (post-softmax-like)
        if rng.random() < 0.5:
            probs = np.exp(4.0 * probs)
        probs /= probs.sum(-1, keepdims=True)
        label_len = rng.integers(1, L + 1, size=(B, 1)).astype(np.int32)
        # ensure CTC-feasible: T >= 2 * L_required roughly; keep margins
        labels = np.zeros((B, L), dtype=np.int32)
        for b in range(B):
            # repeated labels consume 2 frames; keep it feasible
            max_len = min(label_len[b, 0], (T - 2) // 2)
            label_len[b, 0] = max(1, max_len)
            labels[b, : label_len[b, 0]] = rng.integers(
                0, C - 1, size=label_len[b, 0]
            )
        input_len = rng.integers(
            np.maximum(2 * label_len[:, 0] + 1, T // 2), T + 1, size=(B,)
        ).astype(np.int32)[:, None]
        cases.append((probs, labels, input_len, label_len))
    # degenerate: label_length includes full-L and length-1
    return cases


def main():
    import tf_keras  # noqa: F401
    from tf_keras import backend as K

    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(20260816)

    # ---- CTC loss goldens ----
    loss_blobs = {}
    for i, (probs, labels, in_len, lab_len) in enumerate(gen_ctc_cases(rng)):
        loss = np.asarray(
            K.ctc_batch_cost(labels, probs, in_len, lab_len)
        ).astype(np.float32)
        loss_blobs[f"case{i}_probs"] = probs
        loss_blobs[f"case{i}_labels"] = labels
        loss_blobs[f"case{i}_input_len"] = in_len
        loss_blobs[f"case{i}_label_len"] = lab_len
        loss_blobs[f"case{i}_loss"] = loss
    loss_blobs["n_cases"] = np.array(len(gen_ctc_cases(rng)))
    np.savez(os.path.join(OUT_DIR, "ctc_loss.npz"), **loss_blobs)
    print("wrote ctc_loss.npz:", {k: v.shape for k, v in loss_blobs.items() if k.endswith("_loss")})

    # ---- greedy decode goldens ----
    rng = np.random.default_rng(77)
    blobs = {}
    n = 0
    for B, T, C in [(1, 10, 5), (4, 25, 12), (3, 40, 80), (6, 16, 30)]:
        for peaky in (False, True):
            probs = rng.random((B, T, C)).astype(np.float32)
            if peaky:
                probs = np.exp(6.0 * probs)
            probs /= probs.sum(-1, keepdims=True)
            in_len = rng.integers(T // 2, T + 1, size=(B,)).astype(np.int32)
            dec, logp = K.ctc_decode(probs, in_len, greedy=True)
            blobs[f"g{n}_probs"] = probs
            blobs[f"g{n}_input_len"] = in_len
            blobs[f"g{n}_decoded"] = np.asarray(dec[0]).astype(np.int32)
            blobs[f"g{n}_logp"] = np.asarray(logp).astype(np.float32)
            n += 1
    blobs["n_cases"] = np.array(n)
    np.savez(os.path.join(OUT_DIR, "ctc_greedy.npz"), **blobs)
    print(f"wrote ctc_greedy.npz: {n} cases")

    # ---- beam search goldens ----
    rng = np.random.default_rng(123)
    blobs = {}
    n = 0
    for B, T, C, bw, tp in [
        (1, 8, 5, 3, 2),
        (2, 12, 8, 5, 3),
        (3, 20, 12, 10, 1),
        (2, 30, 40, 10, 5),
        (1, 16, 6, 10, 4),
    ]:
        for peaky in (False, True):
            probs = rng.random((B, T, C)).astype(np.float32)
            if peaky:
                probs = np.exp(5.0 * probs)
            probs /= probs.sum(-1, keepdims=True)
            in_len = rng.integers(max(2, T // 2), T + 1, size=(B,)).astype(
                np.int32
            )
            dec, logp = K.ctc_decode(
                probs, in_len, greedy=False, beam_width=bw, top_paths=tp
            )
            blobs[f"b{n}_probs"] = probs
            blobs[f"b{n}_input_len"] = in_len
            blobs[f"b{n}_beam_width"] = np.array(bw)
            blobs[f"b{n}_top_paths"] = np.array(tp)
            # decoded list of tp dense arrays, ragged widths -> store each
            for p in range(tp):
                blobs[f"b{n}_decoded{p}"] = np.asarray(dec[p]).astype(np.int32)
            blobs[f"b{n}_logp"] = np.asarray(logp).astype(np.float32)
            n += 1
    blobs["n_cases"] = np.array(n)
    np.savez(os.path.join(OUT_DIR, "ctc_beam.npz"), **blobs)
    print(f"wrote ctc_beam.npz: {n} cases")


if __name__ == "__main__":
    sys.exit(main())
