"""STN accuracy A/B on a render-warped corpus (VERDICT r4 next #1).

The reference's STN (SURVEY C5 / BASELINE config 3) exists to read
geometrically distorted crops (license plates photographed off-axis). This
eval demonstrates its accuracy VALUE at nonzero CER: two models trained at
equal backbone params/steps on the same render-time-warped corpus
(data/fontgen.py warp_* knobs — distinct from the model-side --augment
warp), one with the STN front end, one without, evaluated on FRESH samples
from the same distribution:

  * greedy CER/WER/seq-acc per model (+ beam-10 standard-CTC for the
    winner's headline);
  * learned theta statistics for the STN arm (mean |theta - identity| per
    component + spread) — evidence the localizer actually learned a
    transform instead of sitting at its identity init.

Writes benchmarks/stn_ab_eval.json.

Run on the TPU after training both arms:
  python tools/stn_ab_eval.py --plain_dir /tmp/ab_warp_plain \
      --stn_dir /tmp/ab_warp_stn
Env knobs: STN_EVAL_N (512), STN_EVAL_SEED, STN_EVAL_FONTCFG (JSON dict —
set to the corpus's exact render config).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# must match tools/make_font_corpus.py's invocation for the A/B corpus
DEFAULT_FONTCFG = {
    "min_words": 1, "max_words": 2, "noise": 0.06,
    "min_size": 16, "max_size": 24,
    "warp_shear": 0.9, "warp_rotate": 4.0, "warp_perspective": 0.25,
}
BUCKET = 256


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--plain_dir", required=True)
    p.add_argument("--stn_dir", required=True)
    p.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "stn_ab_eval.json"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from crnn_ocr_tpu.data.fontgen import FontConfig, FontTextlines
    from crnn_ocr_tpu.infer import init_predictor
    from crnn_ocr_tpu.utils.metrics import cer, sequence_accuracy, wer

    N = int(os.environ.get("STN_EVAL_N", "512"))
    B = 128
    seed = int(os.environ.get("STN_EVAL_SEED", "4242"))
    fontcfg = {
        **DEFAULT_FONTCFG,
        **json.loads(os.environ.get("STN_EVAL_FONTCFG", "{}")),
    }
    synth = FontTextlines(FontConfig(**fontcfg))
    rng = np.random.default_rng(seed)

    def sample_fitting(n):
        images, texts = [], []
        attempts = 0
        while len(images) < n:
            attempts += 1
            if attempts > 20 * n:
                raise RuntimeError(
                    f"only {len(images)}/{n} samples fit bucket {BUCKET}"
                )
            imgs, txts = synth.sample_batch(n - len(images), rng)
            for img, t in zip(imgs, txts):
                h, w = img.shape[:2]
                if round(w * 32 / h) <= BUCKET:
                    images.append(img)
                    texts.append(t)
        return images, texts

    preds = {
        "plain": init_predictor(args.plain_dir),
        "stn": init_predictor(args.stn_dir),
    }
    assert preds["stn"].cfg.use_stn and not preds["plain"].cfg.use_stn

    texts_all = []
    decoded = {k: [] for k in preds}
    beam_decoded = {k: [] for k in preds}
    thetas = []

    # theta extraction: rerun the STN model's forward with intermediates
    # captured; the affine head is the only Dense with output dim 6
    stn_pred = preds["stn"]
    stn_model = stn_pred._model

    @jax.jit
    def stn_thetas(x):
        _, inter = stn_model.apply(
            stn_pred._vars, x[..., None], train=False,
            capture_intermediates=lambda mdl, name: True,
        )
        leaves = jax.tree_util.tree_leaves_with_path(inter)
        outs = [
            v for k, v in leaves
            if hasattr(v, "shape") and v.ndim == 2 and v.shape[-1] == 6
        ]
        assert len(outs) == 1, f"expected one theta head, got {len(outs)}"
        return outs[0]

    from crnn_ocr_tpu.ops.preprocess import pack_canvas, preprocess_batch

    for k in range(0, N, B):
        images, texts = sample_fitting(min(B, N - k))
        texts_all.extend(texts)
        for name, pred in preds.items():
            for pr in pred.predict(images, greedy=True, bucket=BUCKET):
                decoded[name].append(pr.text)
            for pr in pred.predict(
                images, greedy=False, beam_width=10,
                merge_repeated=False, bucket=BUCKET,
            ):
                beam_decoded[name].append(pr.text)
        canvas, hs, ws = pack_canvas(images, quantize=True)
        x, _ = preprocess_batch(
            jnp.asarray(canvas), jnp.asarray(hs), jnp.asarray(ws),
            out_h=32, out_w=BUCKET,
        )
        thetas.append(np.asarray(stn_thetas(x)))
        print(f"[stn_ab] {k + len(images)}/{N}", file=sys.stderr)

    th = np.concatenate(thetas)  # (N, 6)
    ident = np.array([1, 0, 0, 0, 1, 0], np.float32)
    dev = th - ident
    results = {}
    for name in preds:
        results[name] = {
            "greedy_cer": cer(decoded[name], texts_all),
            "greedy_wer": wer(decoded[name], texts_all),
            "greedy_seq_acc": sequence_accuracy(decoded[name], texts_all),
            "beam10_std_cer": cer(beam_decoded[name], texts_all),
            "beam10_std_wer": wer(beam_decoded[name], texts_all),
        }
    results["theta"] = {
        "mean_abs_dev_from_identity": [float(v) for v in
                                       np.mean(np.abs(dev), 0)],
        "std": [float(v) for v in np.std(th, 0)],
        "mean": [float(v) for v in np.mean(th, 0)],
        "frac_samples_deviating": float(
            np.mean(np.max(np.abs(dev), 1) > 0.02)
        ),
    }
    payload = {
        "tool": "tools/stn_ab_eval.py",
        "n": N, "seed": seed, "bucket": BUCKET, "fontcfg": fontcfg,
        "plain_dir": args.plain_dir, "stn_dir": args.stn_dir,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
