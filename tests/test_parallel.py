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


@pytest.mark.slow
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
    assert list(out["valid_mask"]) == [1, 1, 1, 1, 1, 0, 0, 0]


def test_padded_batch_step_matches_unpadded(setup):
    """valid_mask must zero the padding's loss/grad contribution exactly:
    the step result cannot depend on the padded rows' labels or lengths.
    And with masked BatchNorm moments, the padded step must equal the
    unpadded step to fp tolerance INCLUDING updated batch_stats."""
    cfg, state, batch = setup
    rng = jax.random.key(11)
    train_step = make_train_step(cfg, donate=False)

    small = {k: v[:12] for k, v in batch.items()}
    s_ref, m_ref = train_step(
        state, {k: jnp.asarray(v) for k, v in small.items()}, rng
    )

    mesh = make_mesh(8)
    padded = pad_batch_to(dict(small), 16)
    s_pad, m_pad = train_step(
        replicate_state(state, mesh), shard_batch(padded, mesh), rng
    )
    # garbage labels/lengths in the padded rows must change NOTHING
    garbage = {k: np.array(v) for k, v in padded.items()}
    garbage["the_labels"][12:] = 3
    garbage["label_length"][12:] = 4
    garbage["input_length"][12:] = 9
    s_g, m_g = train_step(
        replicate_state(state, mesh), shard_batch(garbage, mesh), rng
    )
    np.testing.assert_allclose(
        float(m_pad["loss"]), float(m_g["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_pad.params),
        jax.tree_util.tree_leaves(s_g.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # padded step == unpadded step: loss, params, AND batch_stats (masked
    # BN moments exclude the pad rows entirely; remaining differences are
    # cross-device reduction order only)
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_pad["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.params),
        jax.tree_util.tree_leaves(s_pad.params),
    ):
        # atol 2e-4: Adam's m/sqrt(v) at step 1 amplifies cross-device
        # reduction-order noise on near-zero-gradient elements
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.batch_stats),
        jax.tree_util.tree_leaves(s_pad.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


@pytest.mark.slow
def test_fit_pads_ragged_batches_on_mesh():
    """fit() must survive a global batch not divisible by the mesh (the
    ragged-last-val-batch case on a real pod)."""
    from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
    from crnn_ocr_tpu.train import FitConfig, fit

    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=4)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=64,
        stem_filters=8,
        block_filters=(8, 8, 12, 12),
        time_dense_size=8,
        n_units=8,
        rnn_layers=1,
        dropout_rate=0.0,
    )
    state = create_train_state(cfg, jax.random.key(0))
    mesh = make_mesh(8)

    def batches(n, bs):
        it = device_batches(
            synthetic_batches(batch_size=bs, bucket=64, steps=n, synth=synth),
            prefetch=0,
        )
        for b in it:
            yield b

    fitcfg = FitConfig(steps=2, eval_every=2, eval_batches=1, log_every=1,
                       mesh=mesh)
    # batch of 12 on an 8-device mesh: 12 % 8 != 0 -> pad path must engage
    out = fit(state, cfg, batches(2, 12),
              eval_iter_fn=lambda: batches(1, 12), codec=synth.codec,
              cfg=fitcfg)
    assert int(out.step) == 2


@pytest.mark.slow
def test_sharded_train_step_pallas_ctc_matches_scan():
    """use_pallas_ctc under a GSPMD mesh must run per-shard via shard_map
    (interpret mode on CPU) and match the scan path's loss/grads."""
    from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines

    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=4)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=64,
        stem_filters=8,
        block_filters=(8, 8, 12, 12),
        time_dense_size=8,
        n_units=8,
        rnn_layers=1,
        dropout_rate=0.0,
    )
    state = create_train_state(cfg, jax.random.key(1))
    host = synthetic_batches(batch_size=16, bucket=64, steps=1, synth=synth)
    batch = next(device_batches(host, prefetch=0))
    batch.pop("texts")
    batch.pop("bucket")
    batch = {k: np.asarray(v) for k, v in batch.items()}
    rng = jax.random.key(5)

    mesh = make_mesh(2)  # 16 global / 2 devices = 8 per shard
    import crnn_ocr_tpu.train.step as step_lib

    old_thresh = step_lib._PALLAS_MIN_BATCH
    step_lib._PALLAS_MIN_BATCH = 8  # let the tiny test batch take the kernel
    try:
        step_p = make_train_step(
            cfg, donate=False, use_pallas_ctc=True, mesh=mesh,
            pallas_interpret=True,
        )
        step_s = make_train_step(cfg, donate=False, use_pallas_ctc=False)
        sp, mp = step_p(
            replicate_state(state, mesh), shard_batch(batch, mesh), rng
        )
        ss, ms = step_s(
            state, {k: jnp.asarray(v) for k, v in batch.items()}, rng
        )
    finally:
        step_lib._PALLAS_MIN_BATCH = old_thresh
    np.testing.assert_allclose(
        float(mp["loss"]), float(ms["loss"]), rtol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(sp.params),
        jax.tree_util.tree_leaves(ss.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


@pytest.mark.slow
def test_pallas_birnn_shard_map_matches_scan():
    """BiRNN with a multi-device mesh runs the fused Pallas cell per shard
    via shard_map (interpret mode on the CPU mesh) — values AND gradients
    must match the XLA-scan path at equal params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from crnn_ocr_tpu.models.rnn import BiRNN

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    # per-shard batch 8 (>= sublane tile), H=128 (lane-aligned)
    x = jnp.asarray(rng.normal(size=(64, 5, 32)).astype(np.float32))

    ref = BiRNN(units=128, use_pallas=False)
    variables = ref.init(jax.random.key(0), x)

    for cell in ("gru", "lstm"):
        ref = BiRNN(units=128, cell=cell, use_pallas=False)
        variables = ref.init(jax.random.key(0), x)

        def loss_ref(v, x_):
            return jnp.sum(jnp.tanh(ref.apply(v, x_)))

        fused = BiRNN(units=128, cell=cell, use_pallas=True,
                      pallas_interpret=True, mesh=mesh)

        def loss_fused(v, x_):
            return jnp.sum(jnp.tanh(fused.apply(v, x_)))

        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        want, gw = jax.value_and_grad(loss_ref)(variables, x)
        got, gg = jax.value_and_grad(loss_fused)(variables, xs)
        np.testing.assert_allclose(
            float(got), float(want), rtol=2e-5, err_msg=cell
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(gg), jax.tree_util.tree_leaves(gw)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=cell,
            )


@pytest.mark.slow
def test_dp_train_step_with_pallas_rnn_matches_scan():
    """Full sharded train step with use_pallas_rnn=True (interpret) ==
    the same step on the scan path — the production multi-chip config."""
    import dataclasses

    from crnn_ocr_tpu.models.rnn import BiRNN  # noqa: F401

    mesh = make_mesh(8)
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=5)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=64,
        stem_filters=8,
        block_filters=(16, 16, 24, 24),
        time_dense_size=16,
        n_units=128,   # lane-aligned so the fused cell engages
        rnn_layers=1,
        dropout_rate=0.0,
    )
    host = synthetic_batches(batch_size=64, bucket=64, steps=1, synth=synth)
    batch = next(device_batches(host, prefetch=0))
    batch.pop("texts")
    batch.pop("bucket")
    batch = {k: np.asarray(v) for k, v in batch.items()}
    rng = jax.random.key(5)

    def run(use_pallas):
        c = dataclasses.replace(cfg, use_pallas_rnn=use_pallas)
        state = create_train_state(
            c, jax.random.key(0), mesh=mesh if use_pallas else None,
            pallas_interpret=True,
        )
        state = replicate_state(state, mesh)
        step = make_train_step(
            c, donate=False, mesh=mesh, use_pallas_ctc=False,
            pallas_interpret=True,
        )
        new_state, m = step(state, shard_batch(batch, mesh), rng)
        return float(m["loss"]), new_state.params

    loss_p, params_p = run(True)
    loss_s, params_s = run(False)
    np.testing.assert_allclose(loss_p, loss_s, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_p),
        jax.tree_util.tree_leaves(params_s),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


@pytest.mark.slow
def test_pallas_grid_sample_shard_map_matches_banded():
    """grid_sample_affine with a multi-device mesh dispatches the Pallas
    sampler per shard via shard_map (interpret on the CPU mesh) — values
    and gradients must match the XLA banded path."""
    from crnn_ocr_tpu.ops.grid_sample import grid_sample_affine

    mesh = make_mesh(8)
    rng = np.random.default_rng(11)
    B, H, W = 16, 16, 24  # n4=384 lane-tileable; per-shard batch 2
    img = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    theta = jnp.asarray(
        (rng.normal(size=(B, 6)) * 0.2).astype(np.float32)
    ) + jnp.asarray([1.0, 0, 0, 0, 1.0, 0])

    def loss(sampler_kw):
        def f(img, theta):
            out = grid_sample_affine(img, theta, **sampler_kw)
            return jnp.sum(jnp.cos(2.0 * out)), out

        return f

    pall = loss(dict(use_pallas=True, mesh=mesh, interpret=True))
    band = loss(dict(use_pallas=False))
    (lp, op), (gi_p, gt_p) = jax.value_and_grad(
        pall, argnums=(0, 1), has_aux=True
    )(img, theta)
    (lb, ob), (gi_b, gt_b) = jax.value_and_grad(
        band, argnums=(0, 1), has_aux=True
    )(img, theta)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ob),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(lp), float(lb), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_b),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_b),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_stem_train_shard_map_sync_bn():
    """fused_stem_train under a multi-device mesh: per-shard kernels with
    psum'd statistics must reproduce the single-device batch stats,
    pooled output, and parameter gradients (exact sync-BN)."""
    from crnn_ocr_tpu.kernels.fused_stem_train import (
        fused_stem_train,
        fused_stem_train_dispatch,
    )

    mesh = make_mesh(2)  # 2 shards exercise the same psum math; interpret
    rng = np.random.default_rng(17)  # mode is slow enough at 4+
    B, H, W, C = 4, 32, 48, 8
    img = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    conv_w = jnp.asarray(
        rng.normal(size=(3, 3, 1, C)).astype(np.float32) * 0.3
    )
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)

    def loss_mesh(cw, g_, b_):
        p, m, v = fused_stem_train_dispatch(
            img, cw, g_, b_, mesh=mesh, bf16=False, interpret=True
        )
        return jnp.sum(jnp.sin(p * 1.3)), (p, m, v)

    def loss_single(cw, g_, b_):
        p, m, v = fused_stem_train(img, cw, g_, b_, 1e-3, False, True,
                                   None)
        return jnp.sum(jnp.sin(p * 1.3)), (p, m, v)

    (lm, (pm, mm, vm)), gm = jax.value_and_grad(
        loss_mesh, argnums=(0, 1, 2), has_aux=True
    )(conv_w, gamma, beta)
    (ls, (ps, ms, vs)), gs = jax.value_and_grad(
        loss_single, argnums=(0, 1, 2), has_aux=True
    )(conv_w, gamma, beta)
    np.testing.assert_allclose(float(lm), float(ls), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(ms),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pm, np.float32),
                               np.asarray(ps, np.float32),
                               rtol=1e-5, atol=1e-5)
    # gradients: mesh and single-device paths run DIFFERENT grid splits
    # (per-shard G differs), so partial sums reduce in different orders —
    # agreement is to f32 accumulation noise, not bitwise (measured max
    # rel ~4e-4 on dw at |val|~60)
    for a, b in zip(gm, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def test_editdistance_sharded_matches_unsharded():
    """Batched Levenshtein under a data-sharded jit: GSPMD partitions the
    diagonal scan batch-parallel (no cross-sample deps), so a pod-scale
    eval can keep CER on-device. Values must match the unsharded op."""
    from crnn_ocr_tpu.ops.editdistance import batched_levenshtein

    rng = np.random.default_rng(11)
    B, La, Lb = 16, 12, 9
    a = rng.integers(0, 6, (B, La)).astype(np.int32)
    b = rng.integers(0, 6, (B, Lb)).astype(np.int32)
    la = rng.integers(0, La + 1, B).astype(np.int32)
    lb = rng.integers(0, Lb + 1, B).astype(np.int32)
    want = np.asarray(batched_levenshtein(a, la, b, lb))

    mesh = make_mesh(8)
    sharded = shard_batch(
        {"a": a, "la": la, "b": b, "lb": lb}, mesh
    )
    got = np.asarray(
        batched_levenshtein(
            sharded["a"], sharded["la"], sharded["b"], sharded["lb"]
        )
    )
    np.testing.assert_array_equal(got, want)


def test_mesh_predictor_matches_single_device(setup):
    """Data-parallel serving (Predictor(mesh=...)): batch sharded over
    'data', params replicated — decoded text and probabilities must match
    the single-device predictor, including a batch size that does NOT
    divide the mesh (transparent pad + slice)."""
    from crnn_ocr_tpu.infer import Predictor

    cfg, state, _ = setup
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=5)
    )
    rng = np.random.default_rng(23)
    images, _ = synth.sample_batch(11, rng)  # 11 % 8 != 0 on purpose
    single = Predictor(
        cfg, state.params, state.batch_stats, synth.codec, buckets=(64,)
    )
    dp = Predictor(
        cfg, state.params, state.batch_stats, synth.codec, buckets=(64,),
        mesh=make_mesh(8),
    )
    p1, l1 = single.predict_probs(list(images))
    p2, l2 = dp.predict_probs(list(images))
    assert p2.shape == p1.shape
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-6
    )
    t1 = single.predict_text(list(images))
    t2 = dp.predict_text(list(images))
    assert t1 == t2
