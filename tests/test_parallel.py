"""Distributed tests on the simulated 8-device CPU mesh (SURVEY.md §4):
data-parallel step == single-device step on the same global batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
from crnn_ocr_tpu.data.pipeline import device_batches, synthetic_batches
from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.parallel import (
    make_mesh,
    pad_batch_to,
    replicate_state,
    shard_batch,
)
from crnn_ocr_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=5)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=64,
        stem_filters=8,
        block_filters=(16, 16, 24, 24),
        time_dense_size=16,
        n_units=16,
        rnn_layers=1,
        dropout_rate=0.0,
    )
    state = create_train_state(cfg, jax.random.key(0))
    host = synthetic_batches(batch_size=16, bucket=64, steps=1, synth=synth)
    batch = next(device_batches(host, prefetch=0))
    batch.pop("texts")
    batch.pop("bucket")
    batch = {k: np.asarray(v) for k, v in batch.items()}
    return cfg, state, batch


def test_dp_step_matches_single_device(setup):
    cfg, state, batch = setup
    rng = jax.random.key(7)
    train_step = make_train_step(cfg, donate=False)

    # single device
    s1, m1 = train_step(state, {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    # 8-device data parallel
    mesh = make_mesh(8)
    state8 = replicate_state(state, mesh)
    batch8 = shard_batch(batch, mesh)
    s8, m8 = train_step(state8, batch8, rng)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    # BatchNorm stats must also be computed over the GLOBAL batch (sync-BN)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.batch_stats),
        jax.tree_util.tree_leaves(s8.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_dp_multi_step_stays_in_sync(setup):
    cfg, state, batch = setup
    rng = jax.random.key(3)
    train_step = make_train_step(cfg, donate=False)
    mesh = make_mesh(8)
    s1 = state
    s8 = replicate_state(state, mesh)
    for i in range(3):
        b1 = {k: jnp.asarray(v) for k, v in batch.items()}
        s1, m1 = train_step(s1, b1, rng)
        s8, m8 = train_step(s8, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-4
    )


def test_pad_batch_to():
    batch = {
        "x": np.ones((5, 32, 64), np.float32),
        "input_length": np.full((5,), 10, np.int32),
        "the_labels": np.ones((5, 4), np.int32),
        "label_length": np.full((5,), 4, np.int32),
    }
    out = pad_batch_to(batch, 8)
    assert out["x"].shape[0] == 8
    assert list(out["input_length"][5:]) == [1, 1, 1]
    assert list(out["label_length"][5:]) == [0, 0, 0]
