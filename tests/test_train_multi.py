"""Multi-step-per-dispatch training (train.step.make_multi_train_step).

The K-step ``lax.scan`` path exists to amortize per-dispatch host/tunnel
overhead (measured attribution: benchmarks/input_gap_profile.json — ~25 ms
of non-device time per single-step dispatch on this environment vs a 3.5 ms
device step). Its contract: device math IDENTICAL to K sequential
``make_train_step`` calls — same preprocess, same dropout stream (the rng
folds ``state.step``, which increments inside the scan), same optimizer
updates. These tests pin that equivalence, the host-side batch stacking, and
the fit()-loop integration (cadence crossing, partial-group fallback)."""

import jax
import numpy as np
import pytest

from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
from crnn_ocr_tpu.data.pipeline import (
    device_batches,
    stack_host_batches,
    synthetic_batches,
)
from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.train import create_train_state
from crnn_ocr_tpu.train.step import make_multi_train_step, make_train_step


@pytest.fixture(scope="module")
def tiny():
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=4)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=64,
        stem_filters=8,
        block_filters=(12, 16, 16, 24),
        time_dense_size=16,
        n_units=16,
        rnn_layers=1,
        dropout_rate=0.1,  # nonzero: pins the per-step dropout-stream parity
    )
    return synth, cfg


def _raw(synth, n, batch_size=8, seed=0):
    return synthetic_batches(
        batch_size=batch_size, bucket=64, steps=n, seed=seed, synth=synth
    )


def test_stack_host_batches_groups_and_flushes_leftovers(tiny):
    synth, _ = tiny
    items = list(stack_host_batches(_raw(synth, 5), 2, prefetch=0))
    stacks = [it for it in items if "stacked" in it]
    singles = [it for it in items if "stacked" not in it]
    assert len(stacks) == 2 and len(singles) == 1
    for st in stacks:
        assert st["the_input"].shape[0] == 2  # K axis
        assert st["the_labels"].shape[:2] == (2, 8)
        assert st["the_input"].dtype == np.uint8
    # global produce indices cover 0..4 exactly once (augment key stream)
    idx = sorted(
        [int(i) for st in stacks for i in st["batch_index"]]
        + [int(s["batch_index"]) for s in singles]
    )
    assert idx == [0, 1, 2, 3, 4]
    # n_inner=1 passes straight through
    plain = list(stack_host_batches(_raw(synth, 2), 1, prefetch=0))
    assert all("stacked" not in b for b in plain) and len(plain) == 2


def test_multi_step_matches_k_single_steps(tiny):
    """One K=3 scan call == 3 sequential single-step calls: losses per inner
    step, updated params, opt state, and BN stats all agree."""
    synth, cfg = tiny
    K, B = 3, 8
    rng = jax.random.key(7)
    state_a = create_train_state(cfg, jax.random.key(0), batch_size=B)
    state_b = create_train_state(cfg, jax.random.key(0), batch_size=B)
    single = make_train_step(cfg, donate=False)
    multi = make_multi_train_step(cfg, donate=False)

    losses_a = []
    for db in device_batches(_raw(synth, K), prefetch=0):
        db.pop("texts"), db.pop("bucket")
        state_a, m = single(state_a, db, rng)
        losses_a.append(float(m["loss"]))

    stacks = list(stack_host_batches(_raw(synth, K), K, prefetch=0))
    assert len(stacks) == 1 and stacks[0]["stacked"] == K
    st = stacks[0]
    st.pop("texts"), st.pop("stacked")
    bucket = st.pop("bucket")
    state_b, ms = multi(state_b, st, rng, bucket=bucket)

    np.testing.assert_allclose(
        np.asarray(ms["loss"]), losses_a, rtol=1e-5, atol=1e-6
    )
    assert int(state_b.step) == K == int(state_a.step)
    # measured divergence is pure backward-fusion rounding (scan body vs
    # top-level compile): max |Δ| 9e-8 on params / 4.3e-6 on Adam moments —
    # atol-dominant bounds, since near-zero moments carry large rel noise
    for ta, tb, name, atol in (
        (state_a.params, state_b.params, "params", 1e-6),
        (state_a.batch_stats, state_b.batch_stats, "batch_stats", 1e-6),
        (state_a.opt_state, state_b.opt_state, "opt_state", 2e-5),
    ):
        for a, b in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=atol,
                err_msg=name,
            )


@pytest.mark.slow
def test_fit_steps_per_call_matches_single_step_path(tiny):
    """fit() with steps_per_call=2 over a single-bucket stream reaches the
    same state as the single-step loop (identical batches, same order)."""
    from crnn_ocr_tpu.train import FitConfig, fit

    synth, cfg = tiny
    steps = 6

    state1 = create_train_state(cfg, jax.random.key(0), batch_size=8)
    fit1 = fit(
        state1,
        cfg,
        device_batches(_raw(synth, steps), prefetch=0),
        cfg=FitConfig(steps=steps, log_every=2, eval_every=100),
    )

    state2 = create_train_state(cfg, jax.random.key(0), batch_size=8)
    fit2 = fit(
        state2,
        cfg,
        stack_host_batches(_raw(synth, steps), 2, prefetch=0),
        cfg=FitConfig(
            steps=steps, log_every=2, eval_every=100, steps_per_call=2
        ),
    )

    assert int(fit1.step) == steps == int(fit2.step)
    for a, b in zip(
        jax.tree.leaves(fit1.params), jax.tree.leaves(fit2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


@pytest.mark.slow
def test_multi_step_dp_mesh_matches_single_device(tiny):
    """The K-step scan under an 8-device DP mesh (stack sharded on the batch
    axis via shard_stacked_batch) produces the same updated params as the
    mesh-free scan — GSPMD DP composes with the multi-step path."""
    from crnn_ocr_tpu.parallel import make_mesh
    from crnn_ocr_tpu.parallel import mesh as mesh_lib

    synth, cfg = tiny
    K, B = 2, 8
    rng = jax.random.key(3)

    state_ref = create_train_state(cfg, jax.random.key(0), batch_size=B)
    multi_ref = make_multi_train_step(cfg, donate=False)
    stacks = list(stack_host_batches(_raw(synth, K), K, prefetch=0))
    st = dict(stacks[0])
    st.pop("texts"), st.pop("stacked")
    bucket = st.pop("bucket")
    state_ref, ms_ref = multi_ref(state_ref, st, rng, bucket=bucket)

    mesh = make_mesh(8)
    state_m = create_train_state(
        cfg, jax.random.key(0), batch_size=B, mesh=mesh
    )
    state_m = mesh_lib.replicate_state(state_m, mesh)
    multi_m = make_multi_train_step(cfg, donate=False, mesh=mesh)
    st2 = dict(stacks[0])
    st2.pop("texts"), st2.pop("stacked")
    st2.pop("bucket")
    st2 = mesh_lib.shard_stacked_batch(st2, mesh)
    state_m, ms_m = multi_m(state_m, st2, rng, bucket=bucket)

    np.testing.assert_allclose(
        np.asarray(ms_m["loss"]), np.asarray(ms_ref["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(
        jax.tree.leaves(state_ref.params), jax.tree.leaves(state_m.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_multi_step_augment_stream_matches_single_path(tiny):
    """augment=True inside the K-step scan must reproduce the single-step
    pipeline's augmentation EXACTLY: produce_batch keys the augment stream
    by global batch index, and the scan body folds the same indices
    (batch_index) into the same seed."""
    synth, cfg = tiny
    K, B, seed = 3, 8, 21
    rng = jax.random.key(7)
    state_a = create_train_state(cfg, jax.random.key(0), batch_size=B)
    state_b = create_train_state(cfg, jax.random.key(0), batch_size=B)
    single = make_train_step(cfg, donate=False)
    multi = make_multi_train_step(cfg, donate=False, augment=True,
                                  augment_seed=seed)

    losses_a = []
    for db in device_batches(_raw(synth, K), prefetch=0, augment=True,
                             augment_seed=seed):
        db.pop("texts"), db.pop("bucket")
        state_a, m = single(state_a, db, rng)
        losses_a.append(float(m["loss"]))

    st = list(stack_host_batches(_raw(synth, K), K, prefetch=0))[0]
    st.pop("texts"), st.pop("stacked")
    bucket = st.pop("bucket")
    state_b, ms = multi(state_b, st, rng, bucket=bucket)
    np.testing.assert_allclose(
        np.asarray(ms["loss"]), losses_a, rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        )


@pytest.mark.slow
def test_fit_steps_per_call_reaches_exact_budget_with_trim(tiny):
    """cfg.steps not divisible by K: the final stack is TRIMMED so the
    TOTAL budget is reachable exactly (previously the loop stopped short
    at the last K-multiple and --resume could never progress)."""
    from crnn_ocr_tpu.train import FitConfig, fit

    synth, cfg = tiny
    state = create_train_state(cfg, jax.random.key(0), batch_size=8)
    out = fit(
        state,
        cfg,
        stack_host_batches(_raw(synth, 6), 2, prefetch=0),
        cfg=FitConfig(steps=5, log_every=2, eval_every=100,
                      steps_per_call=2),
    )
    assert int(out.step) == 5
