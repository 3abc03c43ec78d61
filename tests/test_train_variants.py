"""Training-variant integration tests: STN model (config 3), mixed width
buckets, exact-Keras loss mode, LSTM cell."""

import itertools

import jax
import numpy as np
import pytest

from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
from crnn_ocr_tpu.data.pipeline import device_batches, synthetic_batches
from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.train import FitConfig, create_train_state, fit


def _tiny_cfg(synth, **kw):
    base = dict(
        num_classes=synth.codec.num_classes,
        width=128,
        stem_filters=8,
        block_filters=(16, 16, 24, 24),
        time_dense_size=16,
        n_units=16,
        rnn_layers=1,
        dropout_rate=0.0,
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def synth():
    return SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=5)
    )


def _run_steps(cfg, synth, steps=40, augment=False, exact=False):
    state = create_train_state(cfg, jax.random.key(0), learning_rate=3e-3)
    it = device_batches(
        synthetic_batches(batch_size=8, bucket=128, steps=steps, synth=synth),
        augment=augment,
    )
    losses = []

    from crnn_ocr_tpu.train import make_train_step

    step = make_train_step(cfg, exact_keras=exact, donate=False)
    rng = jax.random.key(1)
    for batch in it:
        batch.pop("texts", None)
        batch.pop("bucket", None)
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    return losses


@pytest.mark.slow
def test_stn_variant_trains(synth):
    """Config 3: STN-enabled model trains end to end with finite loss and a
    decreasing trend, with on-device augmentation feeding warped inputs."""
    cfg = _tiny_cfg(synth, use_stn=True)
    _run_steps(cfg, synth, steps=40, augment=True)


@pytest.mark.slow
def test_exact_keras_loss_mode_trains(synth):
    cfg = _tiny_cfg(synth)
    _run_steps(cfg, synth, steps=25, exact=True)


@pytest.mark.slow
def test_lstm_variant_trains(synth):
    cfg = _tiny_cfg(synth, rnn_cell="lstm")
    _run_steps(cfg, synth, steps=25)


@pytest.mark.slow
def test_mixed_bucket_training(synth, tmp_path):
    """The fit loop must handle bucket (width) changes between steps —
    each bucket jit-compiles once, then caches."""
    cfg = _tiny_cfg(synth)
    state = create_train_state(cfg, jax.random.key(0), learning_rate=3e-3)

    def mixed_iter():
        a = device_batches(
            synthetic_batches(batch_size=8, bucket=128, steps=20, synth=synth)
        )
        b = device_batches(
            synthetic_batches(
                batch_size=8, bucket=64, steps=20, synth=synth, seed=7
            )
        )
        for x, y in zip(a, b):  # interleave buckets
            yield x
            yield y

    fitcfg = FitConfig(steps=30, eval_every=10**9, log_every=10)
    state = fit(state, cfg, mixed_iter(), cfg=fitcfg)
    assert int(state.step) == 30
