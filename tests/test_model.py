"""Model construction/shape/gradient tests (SURVEY.md §4 unit strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crnn_ocr_tpu.models import CRNN, ModelConfig


@pytest.fixture(scope="module")
def small_cfg():
    return ModelConfig(
        num_classes=11,
        width=64,
        block_filters=(32, 48, 48, 64),
        time_dense_size=32,
        n_units=24,
    )


def _init(cfg, train=False, batch=2):
    model = CRNN(cfg=cfg)
    x = jnp.zeros((batch, cfg.height, cfg.width, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x,
        train=train,
    )
    return model, variables, x


def test_output_shape(small_cfg):
    model, variables, x = _init(small_cfg)
    logits = model.apply(variables, x, train=False)
    T = small_cfg.time_steps()
    assert T == 64 // 4
    assert logits.shape == (2, T, small_cfg.num_classes + 1)
    assert logits.dtype == jnp.float32


def test_stn_identity_at_init():
    """STN's affine head starts at identity: warped input == input."""
    from crnn_ocr_tpu.models.stn import STN

    model = STN()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 64, 1)).astype(
            np.float32
        )
    )
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    # fp32 grid arithmetic leaves ~2e-5 residue at exact integer coords
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_train_mode_runs_and_updates_batch_stats(small_cfg):
    model, variables, x = _init(small_cfg, train=True)
    logits, mutated = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(2)},
    )
    assert "batch_stats" in mutated
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow
def test_end_to_end_gradient(small_cfg):
    """CTC loss through the whole model produces finite nonzero grads."""
    from crnn_ocr_tpu.ops import ctc

    model, variables, _ = _init(small_cfg, train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 1)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 11, size=(2, 5)), jnp.int32)
    T = small_cfg.time_steps() - small_cfg.ctc_time_slice
    in_len = jnp.full((2,), T, jnp.int32)
    lab_len = jnp.full((2,), 5, jnp.int32)

    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=False,
        )
        probs = jax.nn.softmax(logits[:, small_cfg.ctc_time_slice :, :], -1)
        return jnp.mean(ctc.ctc_batch_cost(labels, probs, in_len, lab_len))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total_norm = sum(float(jnp.sum(g * g)) for g in leaves) ** 0.5
    assert total_norm > 0


def test_bilinear_sample_matches_map_coordinates():
    """Grid sampler vs jax.scipy.ndimage.map_coordinates oracle (C17)."""
    from crnn_ocr_tpu.ops.grid_sample import grid_sample_affine

    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 16, 24, 1)).astype(np.float32)
    theta = jnp.asarray([[0.8, 0.1, 0.05, -0.1, 0.9, -0.02]], jnp.float32)
    out = np.asarray(grid_sample_affine(jnp.asarray(img), theta))[0, :, :, 0]

    H, W = 16, 24
    ys, xs = np.meshgrid(
        np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij"
    )
    t = np.asarray(theta).reshape(2, 3)
    sx = t[0, 0] * xs + t[0, 1] * ys + t[0, 2]
    sy = t[1, 0] * xs + t[1, 1] * ys + t[1, 2]
    px = (sx + 1) * (W - 1) / 2
    py = (sy + 1) * (H - 1) / 2
    from jax.scipy.ndimage import map_coordinates

    want = np.asarray(
        map_coordinates(
            jnp.asarray(img[0, :, :, 0]),
            [jnp.asarray(py), jnp.asarray(px)],
            order=1,
            mode="nearest",
        )
    )
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_rnn_bidirectional_is_time_symmetric():
    """Reversing input must swap fwd/bwd output halves, reversed in time."""
    from crnn_ocr_tpu.models.rnn import BiRNN

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 7, 5)).astype(np.float32))
    model = BiRNN(units=4)
    variables = model.init(jax.random.key(0), x)
    # Tie the two directions' weights so symmetry holds exactly.
    p = variables["params"]
    tied = jax.tree_util.tree_map(
        lambda a: a.at[1].set(a[0]), p
    )
    y = model.apply({"params": tied}, x)
    y_rev = model.apply({"params": tied}, x[:, ::-1, :])
    H = 4
    np.testing.assert_allclose(
        np.asarray(y_rev[:, ::-1, H:]), np.asarray(y[:, :, :H]), atol=1e-5
    )


def test_banded_sampler_matches_general():
    """Fast banded path == general path, incl. fallback on big rotations."""
    import jax.numpy as jnp

    from crnn_ocr_tpu.ops.grid_sample import (
        affine_grid,
        bilinear_sample,
        bilinear_sample_banded,
    )

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(size=(3, 32, 64, 1)).astype(np.float32))
    for scale, label in [(0.05, "small"), (0.6, "large-fallback")]:
        theta = jnp.asarray(
            (rng.normal(size=(3, 6)) * scale).astype(np.float32)
        ) + jnp.asarray([1.0, 0, 0, 0, 1.0, 0])
        coords = affine_grid(theta, 32, 64)
        want = bilinear_sample(img, coords)
        got = bilinear_sample_banded(img, coords)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, err_msg=label
        )


def test_banded_sampler_ladder_mixed_batch():
    """One aggressive warp in a batch of near-identities must step the band
    LADDER (8 -> 16 -> 32), not a batch-global slow path — and every rung
    must agree with the general sampler exactly."""
    import jax.numpy as jnp

    from crnn_ocr_tpu.ops.grid_sample import (
        affine_grid,
        bilinear_sample,
        bilinear_sample_banded,
    )

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.normal(size=(4, 32, 64, 1)).astype(np.float32))
    ident = np.tile(
        np.asarray([1.0, 0, 0, 0, 1.0, 0], np.float32), (4, 1)
    )
    # sample 0: strong rotation (~30 deg) — span > 16 rows; rest identity
    c, s = np.cos(0.5), np.sin(0.5)
    ident[0] = [c, -s, 0.1, s, c, -0.1]
    coords = affine_grid(jnp.asarray(ident), 32, 64)
    want = bilinear_sample(img, coords)
    for band in (4, 8, 16):  # every starting rung reaches a covering band
        got = bilinear_sample_banded(img, coords, band=band)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5,
            err_msg=f"band={band}",
        )
