"""Predictor API tests: artifact save -> init_predictor -> predict, the
reference's C8/C11 surface (library-level)."""

import jax
import numpy as np
import pytest

from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
from crnn_ocr_tpu.infer import Predictor, decode_predict_ctc, init_predictor
from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.train import CheckpointManager, create_train_state


@pytest.fixture(scope="module")
def saved_model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("model"))
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=5)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=128,
        stem_filters=8,
        block_filters=(16, 16, 24, 24),
        time_dense_size=16,
        n_units=16,
        rnn_layers=1,
    )
    state = create_train_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(d)
    mgr.save(0, state, cfg, synth.codec)
    mgr.wait()
    return d, synth


def test_init_predictor_roundtrip(saved_model):
    d, synth = saved_model
    pred = init_predictor(d)
    rng = np.random.default_rng(0)
    images, texts = synth.sample_batch(3, rng)
    out = pred.predict(images, greedy=True, timing=True)
    assert len(out) == 3
    for p in out:
        assert isinstance(p.text, str)
        assert np.isfinite(p.score)
        assert p.latency_ms is not None
    # beam path with candidates
    out_b = pred.predict(images, greedy=False, beam_width=4, top_paths=2)
    assert out_b[0].candidates is not None
    assert len(out_b[0].candidates) == 2
    # exact-TF beam path
    out_e = pred.predict(
        images, greedy=False, beam_width=4, top_paths=1, exact_tf=True
    )
    assert isinstance(out_e[0].text, str)


def test_predictor_bucket_selection(saved_model):
    d, synth = saved_model
    pred = init_predictor(d)
    wide = [np.full((32, 400), 255, np.uint8)]
    probs, in_len = pred.predict_probs(wide)
    # 400px at h32 needs bucket 256 -> T = 256/4 - 2
    assert probs.shape[1] == 256 // 4 - 2
    narrow = [np.full((32, 40), 255, np.uint8)]
    probs2, _ = pred.predict_probs(narrow)
    assert probs2.shape[1] == 64 // 4 - 2


def test_decode_predict_ctc_free_function(saved_model):
    _, synth = saved_model
    rng = np.random.default_rng(1)
    B, T, C = 2, 12, synth.codec.num_classes + 1
    probs = rng.random((B, T, C)).astype(np.float32)
    probs = np.exp(5 * probs)
    probs /= probs.sum(-1, keepdims=True)
    texts, scores = decode_predict_ctc(
        probs, top_paths=2, beam_width=5, codec=synth.codec
    )
    assert len(texts) == B and len(texts[0]) == 2
    assert scores.shape == (B, 2)


def test_init_predictor_optimizer_agnostic(tmp_path):
    """Checkpoints written with any optimizer/schedule must load for
    inference (regression: cosine-schedule opt_state used to break the
    template-based restore)."""
    from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
    from crnn_ocr_tpu.train import CheckpointManager, create_train_state

    synth = SyntheticTextlines(SyntheticConfig(alphabet="01234"))
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes, width=64, stem_filters=8,
        block_filters=(8, 8, 8, 8), time_dense_size=8, n_units=8,
        rnn_layers=1,
    )
    d = str(tmp_path / "m")
    state = create_train_state(
        cfg, jax.random.key(0), optimizer="rmsprop", schedule="cosine",
        total_steps=100, warmup_steps=10,
    )
    mgr = CheckpointManager(d)
    mgr.save(0, state, cfg, synth.codec)
    mgr.wait()
    pred = init_predictor(d)
    out = pred.predict_text([np.full((32, 40), 255, np.uint8)])
    assert isinstance(out[0], str)


def test_predict_many_bucket_grouping(saved_model):
    """Mixed widths route to their buckets; output order preserved."""
    d, synth = saved_model
    pred = init_predictor(d)
    rng = np.random.default_rng(6)
    widths = [40, 400, 100, 250, 60, 500]
    images = [
        (rng.random((32, w)) * 255).astype(np.uint8) for w in widths
    ]
    out = pred.predict_many(images, batch_size=2, timing=True)
    assert len(out) == len(images)
    assert all(p is not None and isinstance(p.text, str) for p in out)


def test_predict_with_alignment_consistent(saved_model):
    """Alignment chars join to the greedy text; spans are in-bounds,
    ordered, and non-overlapping (runs are disjoint frame blocks)."""
    d, synth = saved_model
    pred = init_predictor(d)
    rng = np.random.default_rng(7)
    images, _ = synth.sample_batch(4, rng)
    spans_all = pred.predict_with_alignment(images)
    texts = pred.predict_text(images, greedy=True)
    assert len(spans_all) == 4
    for img, spans, text in zip(images, spans_all, texts):
        assert "".join(s.char for s in spans) == text
        w = img.shape[1]
        prev_end = 0
        for s in spans:
            assert 0 <= s.x0 < s.x1 <= w
            assert s.x0 >= prev_end  # disjoint runs -> disjoint spans
            prev_end = s.x1
            assert 0.0 < s.conf <= 1.0


def test_predict_with_alignment_squeezed_image(saved_model):
    """Images wider than the largest bucket get SQUEEZED into it
    (preprocess_batch clamps w_new); spans must map back through the
    effective per-image scale — in-bounds, ordered, disjoint, and with the
    last span reaching no further than the true width (regression: the old
    aspect-preserving scale compressed every span into the left
    bucket*h/32 columns)."""
    d, synth = saved_model
    pred = init_predictor(d)
    rng = np.random.default_rng(9)
    # 700px at h32 -> w_need 700 > largest bucket 256 -> squeeze
    img = (rng.random((32, 700)) * 255).astype(np.uint8)
    out = pred.predict([img], greedy=True, alignments=True)
    spans = out[0].spans
    assert spans is not None
    w = img.shape[1]
    prev_end = 0
    for s in spans:
        assert 0 <= s.x0 < s.x1 <= w
        assert s.x0 >= prev_end
        prev_end = s.x1
    # exact mapping check: the effective scale is ds * w / w_new with
    # w_new clamped to the bucket (256), NOT the aspect-preserving h-ratio
    from crnn_ocr_tpu.ops import ctc as ctc_ops

    probs, il = pred.predict_probs([img], bucket=256)
    labels, starts, ends, _ = map(
        np.asarray, ctc_ops.ctc_greedy_alignment(probs, il)
    )
    scale = 4 * w / 256  # ds * w / w_new, w_new squeezed to the bucket
    sl = pred.cfg.ctc_time_slice
    for j, s in enumerate(spans):
        assert labels[0, j] >= 0
        assert s.x0 == min(int(np.floor((starts[0, j] + sl) * scale)), w - 1)
        exp_x1 = int(np.floor((ends[0, j] + 1 + sl) * scale))
        assert s.x1 == min(max(exp_x1, s.x0 + 1), w)


def test_predict_beam_alignments_join_to_beam_text(saved_model):
    """Beam mode force-aligns the decoded top path: span chars join to the
    RETURNED beam text (not a separate greedy pass), spans ordered and
    disjoint."""
    d, synth = saved_model
    pred = init_predictor(d)
    rng = np.random.default_rng(12)
    images, _ = synth.sample_batch(4, rng)
    out = pred.predict(
        images, greedy=False, beam_width=5, top_paths=1, alignments=True
    )
    for img, p in zip(images, out):
        assert p.spans is not None
        assert "".join(s.char for s in p.spans) == p.text
        prev_end = 0
        for s in p.spans:
            assert 0 <= s.x0 < s.x1 <= img.shape[1]
            assert s.x0 >= prev_end
            prev_end = s.x1
            assert 0.0 < s.conf <= 1.0


def test_predict_exact_tf_beam_alignments(saved_model):
    """The host exact-TF beam path also force-aligns its decoded top path
    when alignments=True (same contract as the device beam path)."""
    d, synth = saved_model
    pred = init_predictor(d)
    rng = np.random.default_rng(21)
    images, _ = synth.sample_batch(2, rng)
    out = pred.predict(
        images, greedy=False, beam_width=4, exact_tf=True, alignments=True
    )
    for img, p in zip(images, out):
        assert p.spans is not None
        assert "".join(s.char for s in p.spans) == p.text
        prev = 0
        for s in p.spans:
            assert 0 <= s.x0 < s.x1 <= img.shape[1]
            assert s.x0 >= prev
            prev = s.x1


def test_beam_merge_default_keyed_on_provenance(saved_model):
    """Native (own-trained) models default to standard CTC beam extraction
    (merge_repeated=False); migrated Keras artifacts keep K.ctc_decode
    parity (True). Explicit merge_repeated always overrides; the decode
    path resolves None to the provenance default."""
    import dataclasses

    d, synth = saved_model
    pred = init_predictor(d)
    assert pred.cfg.provenance == "native"
    assert pred.default_merge_repeated is False

    mig_cfg = dataclasses.replace(pred.cfg, provenance="keras_migrated")
    pred_mig = Predictor(
        mig_cfg, pred._vars["params"], pred._vars["batch_stats"], synth.codec
    )
    assert pred_mig.default_merge_repeated is True

    # behavioral resolution: a posterior with a blank-separated double
    # letter decodes differently under the two defaults
    from crnn_ocr_tpu.infer.predictor import decode_predict_ctc
    from crnn_ocr_tpu.ops import ctc

    C = synth.codec.num_classes + 1
    y = np.full((1, 5, C), 1e-4, np.float32)
    y[0, 0, 0] = 0.9   # label 0
    y[0, 1, C - 1] = 0.9  # blank
    y[0, 2, 0] = 0.9   # label 0 again -> "00" unmerged, "0" merged
    y[0, 3, C - 1] = 0.9
    y[0, 4, C - 1] = 0.9
    il = np.array([5], np.int32)
    dec_m, _ = ctc.ctc_decode(y, il, greedy=False, beam_width=4,
                              merge_repeated=True)
    dec_u, _ = ctc.ctc_decode(y, il, greedy=False, beam_width=4,
                              merge_repeated=False)
    assert ctc.trim_dense(dec_m[0])[0] == [0]
    assert ctc.trim_dense(dec_u[0])[0] == [0, 0]


def test_stn_predictor_single_native_bucket(saved_model):
    """An STN model's loc-Dense is width-bound (C5): the predictor must
    route every request to the training bucket, narrow or wide."""
    from crnn_ocr_tpu.train import create_train_state

    _, synth = saved_model
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=128,
        stem_filters=8,
        block_filters=(8, 8, 8, 8),
        time_dense_size=8,
        n_units=8,
        rnn_layers=1,
        use_stn=True,
    )
    state = create_train_state(cfg, jax.random.key(0))
    pred = Predictor(cfg, state.params, state.batch_stats, synth.codec)
    assert pred.buckets == (128,)
    narrow = [np.full((32, 40), 255, np.uint8)]
    wide = [np.full((32, 400), 255, np.uint8)]
    for ims in (narrow, wide):
        probs, _ = pred.predict_probs(ims)
        assert probs.shape[1] == 128 // 4 - 2  # native bucket, not 64/256
