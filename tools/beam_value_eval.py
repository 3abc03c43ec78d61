"""Beam decoding's accuracy value at NONZERO CER (VERDICT r3 #2).

Every bundled training task converges to CER 0.0, where greedy == beam by
construction; this eval demonstrates config 4's reason to exist (BASELINE
"CTC beam search (width 10) on-device with confidence scores") on a task
where greedy actually errs: FRESH FontTextlines samples through the bundled
`fonts-small` pretrained run at ~9% word error (measured first in
tools/ab_parity.py), optionally hardened with extra render noise.

Beam output is reported in BOTH extraction modes (see ops/ctc.py::ctc_decode):
  - merged   = K.ctc_decode parity (TF-V1 merge_repeated=True): repeated
               output labels merge even across blanks, collapsing legitimate
               double letters ("door" -> "dor"). This is what the reference's
               own beam path returns — measured here so the cost of that
               semantics is a number, not a footnote.
  - nomerge  = standard CTC beam search (TF2 semantics, merge_repeated=False)
               — the mode a user should pick for accuracy. The SEARCH and
               SCORES are identical in both modes; only output extraction
               differs.

Per sample: greedy decode, on-device TF-exact beam-10 (top-3 paths with
confidences) in both modes, and the HOST exact oracle on the same posteriors
(must match the device decoder bitwise in both modes — `oracle_agreement`).
Reports greedy vs beam CER/WER/accuracy, where they differ and who was
right, and a confidence separation check (mean top-1 log-prob of correct vs
incorrect beam decodes — the usable-confidence claim). Writes
benchmarks/beam_value_eval.json.

Run on the TPU:  python tools/beam_value_eval.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODES = ("merged", "nomerge")


def main() -> int:
    import jax.numpy as jnp

    from crnn_ocr_tpu.data.fontgen import FontConfig, FontTextlines
    from crnn_ocr_tpu.infer import load_pretrained
    from crnn_ocr_tpu.ops import ctc
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf
    from crnn_ocr_tpu.ops.ctc_beam_exact import ctc_beam_search_decode_exact
    from crnn_ocr_tpu.utils.metrics import cer, sequence_accuracy, wer

    N = int(os.environ.get("BEAM_EVAL_N", "512"))
    B = 128
    seed = int(os.environ.get("BEAM_EVAL_SEED", "777"))
    noise = float(os.environ.get("BEAM_EVAL_NOISE", "0.06"))
    model = os.environ.get("BEAM_EVAL_MODEL", "fonts-small")
    bucket = int(os.environ.get("BEAM_EVAL_BUCKET", "128"))
    min_words = int(os.environ.get("BEAM_EVAL_MIN_WORDS", "1"))
    max_words = int(os.environ.get("BEAM_EVAL_MAX_WORDS", "2"))

    # arbitrary FontConfig overrides (degradations etc.) as a JSON dict —
    # set this to the EXACT config the model's corpus was rendered with so
    # the eval measures the model's own task
    fontcfg = json.loads(os.environ.get("BEAM_EVAL_FONTCFG", "{}"))

    pred = load_pretrained(model)
    codec = pred.codec
    synth = FontTextlines(FontConfig(**{
        "noise": noise, "min_words": min_words, "max_words": max_words,
        **fontcfg,
    }))
    rng = np.random.default_rng(seed)

    def sample_fitting(n):
        """Fresh samples whose height-32-normalized width fits the eval
        bucket (same filter tools/make_font_corpus.py --max_w_new applies,
        so the eval distribution matches a width-capped training corpus)."""
        images, texts = [], []
        attempts = 0
        while len(images) < n:
            attempts += 1
            if attempts > 20 * n:
                raise RuntimeError(
                    f"sample_fitting: {attempts} batches produced only "
                    f"{len(images)}/{n} samples fitting bucket {bucket} — "
                    f"the FontConfig ({min_words}-{max_words} words) renders "
                    "lines too wide for BEAM_EVAL_BUCKET; raise the bucket "
                    "or lower max_words"
                )
            imgs, txts = synth.sample_batch(n - len(images), rng)
            for img, t in zip(imgs, txts):
                h, w = img.shape[:2]
                if round(w * 32 / h) <= bucket:
                    images.append(img)
                    texts.append(t)
        return images, texts

    texts_all, g_txt = [], []
    b_txt = {m: [] for m in MODES}
    b_cands = {m: [] for m in MODES}
    b_logp = []  # mode-invariant (merge is output-extraction only)
    oracle_mismatch = {m: 0 for m in MODES}
    for k in range(0, N, B):
        images, texts = sample_fitting(min(B, N - k))
        texts_all.extend(texts)
        probs, il = pred.predict_probs(images, bucket=bucket)
        probs_np, il_np = np.asarray(probs), np.asarray(il)

        dec_g, _ = ctc.ctc_greedy_decode(probs, il)
        for row in ctc.trim_dense(np.asarray(dec_g)):
            g_txt.append(codec.labels_to_text(row))

        logp_prev = None
        for mode in MODES:
            merge = mode == "merged"
            dec_b, logp_b = ctc_beam_search_decode_tf(
                jnp.asarray(probs_np), jnp.asarray(il_np),
                beam_width=10, top_paths=3, merge_repeated=merge,
            )
            dec_b, logp_b = np.asarray(dec_b), np.asarray(logp_b)
            if logp_prev is not None:
                assert (logp_b == logp_prev).all(), "scores must be mode-invariant"
            logp_prev = logp_b
            rows_p = [ctc.trim_dense(dec_b[p]) for p in range(3)]
            for i in range(len(images)):
                cands = []
                for p in range(3):
                    t = codec.labels_to_text(rows_p[p][i])
                    lp = float(logp_b[i, p])
                    conf = float(np.exp(lp)) if np.isfinite(lp) else 0.0
                    cands.append((t, round(lp, 4), round(conf, 4)))
                b_txt[mode].append(cands[0][0])
                b_cands[mode].append(cands)
                if mode == MODES[0]:
                    b_logp.append(float(logp_b[i, 0]))

            # host oracle on the SAME posteriors must match the device
            # decoder in the SAME mode
            dec_h, _ = ctc_beam_search_decode_exact(
                probs_np, il_np, beam_width=10, top_paths=3,
                merge_repeated=merge,
            )
            for p in range(3):
                a, b = np.asarray(dec_b[p]), np.asarray(dec_h[p])
                w = max(a.shape[1], b.shape[1], 1)

                def padto(x, w=w):
                    return np.pad(x, ((0, 0), (0, w - x.shape[1])),
                                  constant_values=-1)

                oracle_mismatch[mode] += int(
                    np.sum(~np.all(padto(a) == padto(b), axis=1))
                )
        print(f"[beam_value_eval] {k + len(images)}/{N}", file=sys.stderr)

    res = {
        "greedy": {
            "cer": cer(g_txt, texts_all),
            "wer": wer(g_txt, texts_all),
            "seq_acc": sequence_accuracy(g_txt, texts_all),
        },
        "oracle_agreement": {
            m: f"{3 * N - oracle_mismatch[m]}/{3 * N} paths" for m in MODES
        },
        "oracle_mismatch_paths": dict(oracle_mismatch),
    }
    for mode in MODES:
        txt = b_txt[mode]
        entry = {
            "cer": cer(txt, texts_all),
            "wer": wer(txt, texts_all),
            "seq_acc": sequence_accuracy(txt, texts_all),
        }
        differ = [i for i in range(N) if g_txt[i] != txt[i]]
        beam_fixed = [i for i in differ if txt[i] == texts_all[i] != g_txt[i]]
        beam_broke = [i for i in differ if g_txt[i] == texts_all[i] != txt[i]]
        entry["vs_greedy"] = {
            "n_differ": len(differ),
            "beam_corrected_greedy_error": len(beam_fixed),
            "beam_corrupted_greedy_correct": len(beam_broke),
            "both_wrong_differently": len(differ) - len(beam_fixed)
            - len(beam_broke),
        }
        # confidence separation: usable scores should rank correct decodes
        # above incorrect ones
        lp = np.array(b_logp)
        ok = np.array([txt[i] == texts_all[i] for i in range(N)])
        entry["confidence"] = {
            "mean_top1_logp_correct": (
                float(lp[ok].mean()) if ok.any() else None
            ),
            "mean_top1_logp_incorrect": (
                float(lp[~ok].mean()) if (~ok).any() else None
            ),
            # rank check: AUC of logp separating correct from incorrect
            "auc_logp_correct_vs_incorrect": (
                float(
                    (np.argsort(np.argsort(lp))[ok].sum()
                     - ok.sum() * (ok.sum() - 1) / 2)
                    / max(ok.sum() * (~ok).sum(), 1)
                )
                if ok.any() and (~ok).any()
                else None
            ),
        }
        samples = []
        # fixed/broke first, then remaining differs — deduped (they overlap)
        for i in list(dict.fromkeys(beam_fixed + beam_broke + differ))[:6]:
            samples.append({
                "truth": texts_all[i],
                "greedy": g_txt[i],
                "beam_top3": b_cands[mode][i],
            })
        entry["example_diffs"] = samples
        res[f"beam10_{mode}"] = entry

    import jax

    payload = {
        "tool": "tools/beam_value_eval.py",
        "backend": jax.default_backend(),
        "model": model,
        # provenance-keyed default (round 5): which measured mode a user
        # gets when calling predict(greedy=False) with no merge argument
        "provenance": pred.cfg.provenance,
        "default_beam_mode": (
            "merged" if pred.default_merge_repeated else "nomerge"
        ),
        "n": N,
        "seed": seed,
        "render_noise": noise,
        "bucket": bucket,
        "words": [min_words, max_words],
        "fontcfg_overrides": fontcfg,
        "results": res,
    }
    suffix = "" if model == "fonts-small" else f"_{model.replace('-', '_')}"
    with open(os.path.join(REPO, "benchmarks",
                           f"beam_value_eval{suffix}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
