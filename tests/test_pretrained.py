"""Pretrained artifact tests (skip when no artifact is committed)."""

import numpy as np
import pytest


def test_load_pretrained_reads_text():
    from crnn_ocr_tpu.infer import load_pretrained, pretrained_dir

    try:
        d = pretrained_dir("fonts-small")
    except KeyError:
        pytest.skip("no registry entry")
    import os

    if not os.path.exists(os.path.join(d, "weights.h5")):
        pytest.skip("pretrained artifact not present")

    pred = load_pretrained("fonts-small")
    from crnn_ocr_tpu.data import FontTextlines

    fonts = FontTextlines()
    rng = np.random.default_rng(31337)
    images, texts = fonts.sample_batch(8, rng)
    got = pred.predict_text(images)
    acc = sum(g == t for g, t in zip(got, texts))
    assert acc >= 6, list(zip(got, texts))


def test_unknown_pretrained_name():
    from crnn_ocr_tpu.infer import pretrained_dir

    with pytest.raises(KeyError):
        pretrained_dir("nope")


def test_load_pretrained_reresolves_runtime_flags(monkeypatch):
    import os
    """The artifact's serialized kernel knobs (use_pallas_rnn=false from
    whatever backend trained it) must be IGNORED: runtime paths are
    per-process policy, exactly like init_predictor."""
    import crnn_ocr_tpu.models.rnn as rnn_mod
    from crnn_ocr_tpu.infer import load_pretrained, pretrained_dir

    d = pretrained_dir("fonts-small")
    if not os.path.exists(os.path.join(d, "weights.h5")):
        pytest.skip("pretrained artifact not present")
    monkeypatch.setattr(rnn_mod, "pallas_rnn_default", lambda: True)
    pred = load_pretrained("fonts-small")
    assert pred.cfg.use_pallas_rnn is True  # policy won over the JSON


def test_load_pretrained_fonts_stn():
    """Config-3 artifact (STN front end): native-bucket serving + reads
    fresh printed text."""
    import os

    from crnn_ocr_tpu.infer import load_pretrained, pretrained_dir

    try:
        d = pretrained_dir("fonts-stn")
    except KeyError:
        pytest.skip("fonts-stn not registered")
    if not os.path.exists(os.path.join(d, "weights.h5")):
        pytest.skip("pretrained artifact not present")

    pred = load_pretrained("fonts-stn")
    assert pred.cfg.use_stn and pred.buckets == (pred.cfg.width,)
    from crnn_ocr_tpu.data import FontTextlines

    fonts = FontTextlines()
    rng = np.random.default_rng(424242)
    images, texts = fonts.sample_batch(6, rng)
    got = pred.predict_text(images)
    acc = sum(g == t for g, t in zip(got, texts))
    assert acc >= 5, list(zip(got, texts))


def test_load_pretrained_fonts_warp_stn():
    """The STN accuracy-value anchor (round 5): trained on render-time
    shear/rotation/perspective-warped lines (no model-side augment). On
    fresh warped samples it must read most lines right at its plateau
    (fresh-eval CER ~0.011) — assert a band, not perfection."""
    import os

    from crnn_ocr_tpu.data import FontConfig, FontTextlines
    from crnn_ocr_tpu.infer import load_pretrained, pretrained_dir
    from crnn_ocr_tpu.utils.metrics import cer

    try:
        d = pretrained_dir("fonts-warp-stn")
    except KeyError:
        pytest.skip("fonts-warp-stn not registered")
    if not os.path.exists(os.path.join(d, "weights.h5")):
        pytest.skip("pretrained artifact not present")

    pred = load_pretrained("fonts-warp-stn")
    assert pred.cfg.use_stn and pred.buckets == (256,)
    assert pred.cfg.provenance == "native"
    synth = FontTextlines(FontConfig(
        min_words=1, max_words=2, noise=0.06, min_size=16, max_size=24,
        warp_shear=0.9, warp_rotate=4.0, warp_perspective=0.25,
    ))
    rng = np.random.default_rng(77)
    images, texts = [], []
    for attempt in range(20 * 48):
        if len(images) >= 48:
            break
        imgs, txts = synth.sample_batch(48 - len(images), rng)
        for img, t in zip(imgs, txts):
            h, w = img.shape[:2]
            if round(w * 32 / h) <= 256:
                images.append(img)
                texts.append(t)
    else:
        raise RuntimeError("could not render 48 bucket-256 samples")
    got = pred.predict_text(images, bucket=256)
    c = cer(got, texts)
    assert c < 0.08, (c, list(zip(got, texts))[:4])


def test_load_pretrained_fonts_hard():
    """The nonzero-CER anchor artifact: trained on the DEGRADED multi-word
    task (blur/contrast/resolution loss/noise). On fresh samples from its
    own distribution it must read most lines right but is EXPECTED to err
    (val plateau CER ~0.04) — assert a band, not perfection."""
    import os

    from crnn_ocr_tpu.data import FontConfig, FontTextlines
    from crnn_ocr_tpu.infer import load_pretrained, pretrained_dir
    from crnn_ocr_tpu.utils.metrics import cer

    try:
        d = pretrained_dir("fonts-hard")
    except KeyError:
        pytest.skip("fonts-hard not registered")
    if not os.path.exists(os.path.join(d, "weights.h5")):
        pytest.skip("pretrained artifact not present")

    pred = load_pretrained("fonts-hard")
    synth = FontTextlines(FontConfig(
        noise=0.12, min_words=2, max_words=3, min_size=12, max_size=20,
        blur=1.2, contrast_min=0.35, downscale_min=0.5,
    ))
    rng = np.random.default_rng(99)
    images, texts = [], []
    for attempt in range(20 * 48):
        if len(images) >= 48:
            break
        imgs, txts = synth.sample_batch(48 - len(images), rng)
        for img, t in zip(imgs, txts):
            h, w = img.shape[:2]
            if round(w * 32 / h) <= 256:
                images.append(img)
                texts.append(t)
    else:
        raise RuntimeError(
            f"only {len(images)}/48 samples fit bucket 256 — FontConfig "
            "renders lines too wide for this test's bucket"
        )
    got = pred.predict_text(images, bucket=256)
    c = cer(got, texts)
    assert c < 0.15, (c, list(zip(got, texts))[:4])
