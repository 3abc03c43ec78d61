"""Integration: tiny synthetic train run -> loss drops, decode recovers text
(SURVEY.md §4 'integration' row), plus checkpoint save/restore round-trip."""

import jax
import numpy as np
import pytest

from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
from crnn_ocr_tpu.data.pipeline import device_batches, synthetic_batches
from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.train import (
    FitConfig,
    create_train_state,
    fit,
    make_eval_step,
)


@pytest.fixture(scope="module")
def tiny_setup():
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=5)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=128,
        stem_filters=16,
        block_filters=(24, 32, 32, 48),
        time_dense_size=24,
        n_units=32,
        rnn_layers=1,
        dropout_rate=0.0,
    )
    return synth, cfg


@pytest.fixture()
def tiny_state(tiny_setup):
    # Per-test state: fit()'s train step donates its input buffers, so a
    # module-shared state would be deleted by whichever test runs first.
    _, cfg = tiny_setup
    return create_train_state(cfg, jax.random.key(0), learning_rate=3e-3)


def _batches(synth, batch_size=16, steps=None, seed=0):
    host = synthetic_batches(
        batch_size=batch_size, bucket=128, steps=steps, seed=seed, synth=synth
    )
    return device_batches(host, prefetch=0)


@pytest.mark.slow
def test_tiny_training_learns(tiny_setup, tiny_state, tmp_path):
    synth, cfg = tiny_setup
    state = tiny_state

    fitcfg = FitConfig(
        steps=120,
        eval_every=60,
        eval_batches=2,
        log_every=40,
        checkpoint_dir=str(tmp_path / "ckpt"),
        metrics_path=str(tmp_path / "metrics.jsonl"),
    )
    state = fit(
        state,
        cfg,
        _batches(synth, steps=120),
        eval_iter_fn=lambda: _batches(synth, seed=123, steps=2),
        codec=synth.codec,
        cfg=fitcfg,
    )

    # After 120 steps on a 10-char alphabet the loss must have dropped
    # substantially and decoding must recover most training strings.
    import json

    recs = [
        json.loads(l) for l in open(str(tmp_path / "metrics.jsonl"))
    ]
    first = next(r for r in recs if r["kind"] == "train")
    evals = [r for r in recs if r["kind"] == "eval"]
    assert evals, "no eval records"
    assert evals[-1]["loss"] < first["loss"] * 0.5
    assert evals[-1]["cer"] < 0.5

    # checkpoint round-trip restores identical params
    from crnn_ocr_tpu.train import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        state,
    )
    restored = mgr.restore(abstract)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # config + codec reload
    from crnn_ocr_tpu.train import load_codec, load_model_config

    cfg2 = load_model_config(str(tmp_path / "ckpt"))
    assert cfg2 == cfg
    codec2 = load_codec(str(tmp_path / "ckpt"))
    assert codec2.classes == synth.codec.classes


@pytest.mark.slow
def test_resume_is_bitwise_equivalent(tiny_setup, tiny_state, tmp_path):
    """Train 6 steps, checkpoint, restore into a fresh state, train 4 more —
    params must equal a straight 10-step run exactly (full-state resume:
    params, Adam slots, BN stats, step counter, and the data stream)."""
    import jax.numpy as jnp

    from crnn_ocr_tpu.train import CheckpointManager, make_train_step

    synth, cfg = tiny_setup
    state0 = tiny_state
    step_fn = make_train_step(cfg, donate=False)
    rng = jax.random.key(42)

    def batches(n, skip=0):
        it = _batches(synth, batch_size=8, steps=skip + n, seed=11)
        out = []
        for i, b in enumerate(it):
            if i >= skip:
                b.pop("texts", None)
                b.pop("bucket", None)
                out.append(b)
        return out

    # straight 10 steps
    s_a = state0
    for b in batches(10):
        s_a, _ = step_fn(s_a, b, rng)

    # 6 steps -> checkpoint -> restore -> 4 steps (stream continues at 6)
    s_b = state0
    for b in batches(6):
        s_b, _ = step_fn(s_b, b, rng)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(6, s_b, cfg)
    mgr.wait()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        s_b,
    )
    s_c = mgr.restore(abstract)
    for b in batches(4, skip=6):
        s_c, _ = step_fn(s_c, b, rng)

    assert int(s_c.step) == int(s_a.step)
    for pa, pc in zip(
        jax.tree_util.tree_leaves(s_a.params),
        jax.tree_util.tree_leaves(s_c.params),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc))
    for sa, sc in zip(
        jax.tree_util.tree_leaves(s_a.opt_state),
        jax.tree_util.tree_leaves(s_c.opt_state),
    ):
        if hasattr(sa, "shape"):
            np.testing.assert_array_equal(np.asarray(sa), np.asarray(sc))


def test_best_checkpoint_retained_under_rotation(tmp_path):
    """A best-CER checkpoint must survive later worse saves (the reference's
    ModelCheckpoint(save_best_only) behavior); metric-less final saves are
    kept for resume-from-latest."""
    from crnn_ocr_tpu.train.checkpoint import CheckpointManager

    state = {"w": np.arange(4, dtype=np.float32)}
    mgr = CheckpointManager(
        str(tmp_path / "ck"), max_to_keep=2, track_metric="cer"
    )
    for step, cer in [(1, 0.5), (2, 0.05), (3, 0.4), (4, 0.3), (5, 0.2)]:
        mgr.save(step, {"w": state["w"] + step}, metrics={"cer": cer})
    mgr.save(6, {"w": state["w"] + 6})  # final latest, no metrics
    mgr.wait()
    assert mgr.best_step() == 2, "best-CER checkpoint was rotated away"
    assert mgr.latest_step() == 6
    got = mgr.restore({"w": jax.ShapeDtypeStruct((4,), np.float32)}, step=2)
    np.testing.assert_array_equal(np.asarray(got["w"]), state["w"] + 2)


@pytest.mark.slow
def test_files_resume_replays_exact_batch_stream(tmp_path):
    """Files-dataset resume (SURVEY.md §5.4): fit 4 steps -> checkpoint ->
    restore -> fit to a 8-step TOTAL with the stream skipped to step 4 ==
    a straight 8-step run, params bitwise (the reader's iterator state is a
    pure function of (seed, config, step); run_generator(skip=N) replays)."""
    import cv2
    import jax.numpy as jnp

    from crnn_ocr_tpu.data import Reader, ReaderConfig
    from crnn_ocr_tpu.data.pipeline import device_batches
    from crnn_ocr_tpu.train import CheckpointManager, FitConfig, fit

    d = tmp_path / "ds"
    d.mkdir()
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=4)
    )
    rng = np.random.default_rng(5)
    lines = []
    for i in range(32):
        imgs, texts = synth.sample_batch(1, rng)
        cv2.imwrite(str(d / f"l{i}.png"), imgs[0])
        lines.append(f"l{i}.png\t{texts[0]}")
    (d / "annotation.txt").write_text("\n".join(lines))

    reader = Reader(ReaderConfig(path=str(d), batch_size=8, val_fraction=0.0,
                                 shuffle_seed=3))
    cfg = ModelConfig(
        num_classes=reader.codec.num_classes, width=64, stem_filters=8,
        block_filters=(8, 8, 12, 12), time_dense_size=8, n_units=8,
        rnn_layers=1, dropout_rate=0.0,
    )

    def stream(skip=0):
        return device_batches(reader.run_generator(train=True, skip=skip),
                              prefetch=0)

    def fresh_state():  # the train step donates buffers: one state per fit
        return create_train_state(cfg, jax.random.key(0))

    # straight 8 steps
    s_a = fit(fresh_state(), cfg, stream(),
              cfg=FitConfig(steps=8, log_every=100))

    # 4 steps -> checkpoint -> restore -> 4 more (total budget 8)
    ckdir = str(tmp_path / "ck")
    s_b = fit(fresh_state(), cfg, stream(),
              cfg=FitConfig(steps=4, log_every=100, checkpoint_dir=ckdir))
    mgr = CheckpointManager(ckdir)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, s_b,
    )
    s_c = mgr.restore(abstract)
    assert int(s_c.step) == 4
    s_c = fit(s_c, cfg, stream(skip=4), cfg=FitConfig(steps=8, log_every=100))

    assert int(s_c.step) == int(s_a.step) == 8
    for pa, pc in zip(
        jax.tree_util.tree_leaves(s_a.params),
        jax.tree_util.tree_leaves(s_c.params),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc))


def test_profile_dir_writes_xplane_trace(tiny_setup, tiny_state, tmp_path):
    """--profile_dir wiring (SURVEY.md §5.1): fit() with profile_dir set
    must produce a loadable xplane trace directory."""
    import os

    from crnn_ocr_tpu.train import FitConfig, fit

    synth, cfg = tiny_setup
    state = tiny_state
    prof = str(tmp_path / "prof")
    fit(state, cfg, _batches(synth, batch_size=8, steps=10),
        cfg=FitConfig(steps=10, log_every=100, profile_dir=prof,
                      profile_at=2, profile_steps=3))
    found = []
    for root, _, files in os.walk(prof):
        found += [f for f in files if f.endswith(".xplane.pb")]
    assert found, f"no xplane trace under {prof}"
