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
