"""Pallas kernel tests (interpret mode on the CPU mesh; real-TPU runs are
exercised by bench.py / tools drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crnn_ocr_tpu.kernels.bigru import (
    _bigru_scan_ref,
    bigru_fused,
    bigru_supported,
)


def _rand_inputs(rng, T=6, D=2, B=8, H=128, dtype=jnp.float32):
    xw = jnp.asarray(rng.normal(size=(T, D, B, 3 * H)).astype(np.float32), dtype)
    u = jnp.asarray(rng.normal(size=(D, H, 3 * H)).astype(np.float32) * 0.1, dtype)
    b = jnp.asarray(rng.normal(size=(D, 3 * H)).astype(np.float32) * 0.1, dtype)
    return xw, u, b


def test_bigru_pallas_matches_scan_forward():
    rng = np.random.default_rng(0)
    xw, u, b = _rand_inputs(rng)
    got = bigru_fused(xw, u, b, True)  # interpret mode
    want = _bigru_scan_ref(xw, u, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_bigru_pallas_gradients_match_scan():
    rng = np.random.default_rng(1)
    xw, u, b = _rand_inputs(rng, T=4, B=8, H=128)

    def loss_pallas(xw, u, b):
        return jnp.sum(jnp.tanh(bigru_fused(xw, u, b, True)))

    def loss_scan(xw, u, b):
        return jnp.sum(jnp.tanh(_bigru_scan_ref(xw, u, b)))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(xw, u, b)
    g2 = jax.grad(loss_scan, argnums=(0, 1, 2))(xw, u, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5
        )


def test_birnn_pallas_path_matches_scan_path():
    """BiRNN(use_pallas=True) == BiRNN(use_pallas=False) at equal params."""
    from crnn_ocr_tpu.models.rnn import BiRNN

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 5, 32)).astype(np.float32))
    ref = BiRNN(units=128, use_pallas=False)
    variables = ref.init(jax.random.key(0), x)
    want = ref.apply(variables, x)
    fused = BiRNN(units=128, use_pallas=True, pallas_interpret=True)
    got = fused.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def _rand_lstm_inputs(rng, T=6, D=2, B=8, H=128):
    xw = jnp.asarray(rng.normal(size=(T, D, B, 4 * H)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(D, H, 4 * H)).astype(np.float32) * 0.1)
    return xw, u


def test_bilstm_pallas_matches_scan_forward():
    from crnn_ocr_tpu.kernels.bigru import _bilstm_scan_ref, bilstm_fused

    rng = np.random.default_rng(4)
    xw, u = _rand_lstm_inputs(rng)
    got = bilstm_fused(xw, u, True)  # interpret mode
    want = _bilstm_scan_ref(xw, u)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_bilstm_pallas_gradients_match_scan():
    from crnn_ocr_tpu.kernels.bigru import _bilstm_scan_ref, bilstm_fused

    rng = np.random.default_rng(5)
    xw, u = _rand_lstm_inputs(rng, T=4)

    g1 = jax.grad(
        lambda xw, u: jnp.sum(jnp.tanh(bilstm_fused(xw, u, True))),
        argnums=(0, 1),
    )(xw, u)
    g2 = jax.grad(
        lambda xw, u: jnp.sum(jnp.tanh(_bilstm_scan_ref(xw, u))),
        argnums=(0, 1),
    )(xw, u)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5
        )


def test_birnn_lstm_pallas_path_matches_scan_path():
    """BiRNN lstm (use_pallas=True) == scan path at equal params."""
    from crnn_ocr_tpu.models.rnn import BiRNN

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(8, 5, 32)).astype(np.float32))
    ref = BiRNN(units=128, cell="lstm", use_pallas=False)
    variables = ref.init(jax.random.key(0), x)
    got = BiRNN(
        units=128, cell="lstm", use_pallas=True, pallas_interpret=True
    ).apply(variables, x)
    want = ref.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_bigru_supported_gate():
    assert bigru_supported(8, 128)
    assert bigru_supported(256, 256)
    assert not bigru_supported(8, 100)
    assert not bigru_supported(3, 128)


class TestCtcPallas:
    def _case(self, B=128, T=12, C=9, L=4, seed=0, varlen=True):
        rng = np.random.default_rng(seed)
        logits = rng.normal(size=(B, T, C)).astype(np.float32)
        lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
        labels = jnp.asarray(
            rng.integers(0, C - 1, size=(B, L)), jnp.int32
        )
        if varlen:
            il = jnp.asarray(
                rng.integers(2 * L + 1, T + 1, (B,)), jnp.int32
            )
            ll = jnp.asarray(rng.integers(1, L + 1, (B,)), jnp.int32)
        else:
            il = jnp.full((B,), T, jnp.int32)
            ll = jnp.full((B,), L, jnp.int32)
        return lp, labels, il, ll

    def test_forward_matches_scan(self):
        from crnn_ocr_tpu.kernels.ctc_loss import ctc_loss_pallas
        from crnn_ocr_tpu.ops import ctc

        lp, labels, il, ll = self._case()
        want = ctc.ctc_forward_log_loss(lp, labels, il, ll, blank=lp.shape[-1] - 1)
        got = ctc_loss_pallas(lp, labels, il, ll, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_gradients_match_scan(self):
        from crnn_ocr_tpu.kernels.ctc_loss import ctc_loss_pallas
        from crnn_ocr_tpu.ops import ctc

        lp, labels, il, ll = self._case(seed=3)

        def loss_p(lp):
            return jnp.mean(ctc_loss_pallas(lp, labels, il, ll, True))

        def loss_s(lp):
            return jnp.mean(
                ctc.ctc_forward_log_loss(
                    lp, labels, il, ll, blank=lp.shape[-1] - 1
                )
            )

        g_p = jax.grad(loss_p)(lp)
        g_s = jax.grad(loss_s)(lp)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_s), rtol=1e-4, atol=1e-5
        )

    def test_infeasible_samples_get_zero_gradients(self):
        """A sample whose label needs more frames than input_length must
        contribute exactly zero gradient (the scan path's autodiff does;
        the analytic backward used to emit -1 per position there)."""
        from crnn_ocr_tpu.kernels.ctc_loss import ctc_loss_pallas
        from crnn_ocr_tpu.ops import ctc

        lp, labels, il, ll = self._case(seed=7)
        # Make samples 0 and 1 infeasible: full-length labels but too few
        # frames (L labels need >= L frames, 2L-1 with repeats).
        ll = ll.at[0].set(labels.shape[1]).at[1].set(labels.shape[1])
        labels = labels.at[1, :].set(labels[1, 0])  # repeats: needs 2L-1
        il = il.at[0].set(2).at[1].set(labels.shape[1] + 1)

        def loss_p(lp):
            return jnp.sum(ctc_loss_pallas(lp, labels, il, ll, True))

        def loss_s(lp):
            return jnp.sum(
                ctc.ctc_forward_log_loss(
                    lp, labels, il, ll, blank=lp.shape[-1] - 1
                )
            )

        g_p = np.asarray(jax.grad(loss_p)(lp))
        g_s = np.asarray(jax.grad(loss_s)(lp))
        assert np.all(g_p[0] == 0.0), "infeasible sample 0 grads not zero"
        assert np.all(g_p[1] == 0.0), "infeasible sample 1 grads not zero"
        # feasible samples keep matching the scan path
        np.testing.assert_allclose(g_p[2:], g_s[2:], rtol=1e-4, atol=1e-5)
        assert not np.any(np.isnan(g_p))

    def test_gradients_through_logits(self):
        """Grad through log_softmax composition, full lengths."""
        from crnn_ocr_tpu.kernels.ctc_loss import ctc_loss_pallas
        from crnn_ocr_tpu.ops import ctc

        lp, labels, il, ll = self._case(seed=5, varlen=False)
        logits = lp * 2.0  # arbitrary pre-activations

        def loss_p(z):
            return jnp.sum(
                ctc_loss_pallas(
                    jax.nn.log_softmax(z, -1), labels, il, ll, True
                )
            )

        def loss_s(z):
            return jnp.sum(
                ctc.ctc_forward_log_loss(
                    jax.nn.log_softmax(z, -1), labels, il, ll,
                    blank=lp.shape[-1] - 1,
                )
            )

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_p)(logits)),
            np.asarray(jax.grad(loss_s)(logits)),
            rtol=1e-4,
            atol=1e-5,
        )


def test_bigru_bf16_gradients_dtypes_and_values():
    """bf16 compute path: cotangent dtypes must match the primal inputs
    (xw/u bf16, rec_bias f32 — models/rnn.py casts the bias explicitly),
    and values must still track the scan reference."""
    rng = np.random.default_rng(9)
    xw, u, b = _rand_inputs(rng, T=3, B=8, H=128)
    xw16, u16 = xw.astype(jnp.bfloat16), u.astype(jnp.bfloat16)

    g1 = jax.grad(
        lambda xw, u, b: jnp.sum(
            jnp.tanh(bigru_fused(xw, u, b, True).astype(jnp.float32))
        ),
        argnums=(0, 1, 2),
    )(xw16, u16, b)
    g2 = jax.grad(
        lambda xw, u, b: jnp.sum(
            jnp.tanh(_bigru_scan_ref(xw, u, b).astype(jnp.float32))
        ),
        argnums=(0, 1, 2),
    )(xw16, u16, b)
    assert g1[0].dtype == jnp.bfloat16
    assert g1[1].dtype == jnp.bfloat16
    assert g1[2].dtype == jnp.float32
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(c, np.float32),
            rtol=0.1, atol=0.05,
        )


# ---------------------------------------------------------------------------
# Pallas grid sampler (kernels/grid_sample.py)
# ---------------------------------------------------------------------------


def _rand_coords(rng, B, Ho, Wo, spread=1.3):
    """Random normalized coords, deliberately overshooting [-1, 1] to hit
    the border-clamp paths."""
    return jnp.asarray(
        rng.uniform(-spread, spread, size=(B, Ho, Wo, 2)).astype(np.float32)
    )


def test_grid_sample_pallas_matches_general():
    from crnn_ocr_tpu.kernels.grid_sample import (
        bilinear_sample_pallas,
        sampler_supported,
    )
    from crnn_ocr_tpu.ops.grid_sample import bilinear_sample

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(3, 16, 24, 1)).astype(np.float32))
    coords = _rand_coords(rng, 3, 16, 24)
    assert sampler_supported(img.shape, coords.shape)
    got = bilinear_sample_pallas(img, coords, interpret=True)
    want = bilinear_sample(img, coords)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_grid_sample_pallas_multichunk():
    """W=256 drops the chunk below the flat size -> accumulation across
    grid steps, incl. the d_img output-block accumulator."""
    from crnn_ocr_tpu.kernels.grid_sample import (
        _pick_chunk,
        bilinear_sample_pallas,
    )
    from crnn_ocr_tpu.ops.grid_sample import bilinear_sample

    rng = np.random.default_rng(4)
    B, H, W = 2, 32, 256
    img = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    coords = _rand_coords(rng, B, H, W)
    assert _pick_chunk(H * W, W) < H * W  # really multi-chunk
    got = bilinear_sample_pallas(img, coords, interpret=True)
    want = bilinear_sample(img, coords)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    def loss_p(img):
        return jnp.sum(
            jnp.cos(bilinear_sample_pallas(img, coords, interpret=True))
        )

    def loss_x(img):
        return jnp.sum(jnp.cos(bilinear_sample(img, coords)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_p)(img)),
        np.asarray(jax.grad(loss_x)(img)),
        rtol=1e-4, atol=1e-5,
    )


def test_grid_sample_pallas_gradients_match_xla():
    """Analytic backward kernel == XLA autodiff of the gather sampler,
    w.r.t. the image AND theta (through affine_grid)."""
    from crnn_ocr_tpu.kernels.grid_sample import bilinear_sample_pallas
    from crnn_ocr_tpu.ops.grid_sample import (
        affine_grid,
        bilinear_sample,
    )

    rng = np.random.default_rng(5)
    B, H, W = 2, 16, 24
    img = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    theta = jnp.asarray(
        (rng.normal(size=(B, 6)) * 0.1).astype(np.float32)
    ) + jnp.asarray([1.0, 0, 0, 0, 1.0, 0])

    def loss(sampler):
        def f(img, theta):
            coords = affine_grid(theta, H, W)
            out = sampler(img, coords)
            return jnp.sum(jnp.sin(out * 3.0))

        return f

    pall = loss(lambda i, c: bilinear_sample_pallas(i, c, interpret=True))
    ref = loss(bilinear_sample)
    gi_p, gt_p = jax.grad(pall, argnums=(0, 1))(img, theta)
    gi_x, gt_x = jax.grad(ref, argnums=(0, 1))(img, theta)
    np.testing.assert_allclose(
        np.asarray(gi_p), np.asarray(gi_x), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gt_p), np.asarray(gt_x), rtol=1e-4, atol=1e-4
    )


def test_stn_model_with_pallas_sampler():
    """Full CRNN forward with the Pallas sampler (interpret) == banded."""
    from crnn_ocr_tpu.models import CRNN, ModelConfig
    from crnn_ocr_tpu.models import stn as stn_mod

    cfg = ModelConfig(num_classes=11, width=64, use_stn=True,
                      use_pallas_rnn=False)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 1)).astype(np.float32))

    model_ref = CRNN(cfg=cfg)
    variables = model_ref.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    want = model_ref.apply(variables, x, train=False)

    orig = stn_mod.grid_sample_affine
    try:
        stn_mod.grid_sample_affine = (
            lambda img, theta, mesh=None, interpret=False, **kw: orig(
                img, theta, use_pallas=True, interpret=True
            )
        )
        got = CRNN(cfg=cfg, pallas_interpret=True).apply(
            variables, x, train=False
        )
    finally:
        stn_mod.grid_sample_affine = orig
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------------------
# Fused Pallas serve-stem (kernels/fused_stem.py)
# ---------------------------------------------------------------------------


def _xla_stem_ref(img, conv_w, gamma, beta, mean, var, eps=1e-3):
    """Serve-mode XLA stem: bf16 conv, f32 affine, relu, maxpool 2x2."""
    x = img.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        x, conv_w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    inv = gamma / jnp.sqrt(var + eps)
    y = jnp.maximum(y * inv + (beta - mean * inv), 0.0)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return y.astype(jnp.bfloat16)


def test_fused_stem_matches_xla_reference():
    from crnn_ocr_tpu.kernels.fused_stem import (
        fused_stem_serve,
        stem_supported,
    )

    rng = np.random.default_rng(7)
    B, H, W, C = 4, 32, 128, 64
    img = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    conv_w = jnp.asarray(
        rng.normal(size=(3, 3, 1, C)).astype(np.float32) * 0.2
    )
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.uniform(0.5, 2.0, C).astype(np.float32))

    assert stem_supported(img.shape)
    got = np.asarray(
        fused_stem_serve(img, conv_w, gamma, beta, mean, var,
                         interpret=True),
        np.float32,
    )
    ref = np.asarray(
        _xla_stem_ref(img, conv_w, gamma, beta, mean, var), np.float32
    )
    assert got.shape == (B, H // 2, W // 2, C)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_fused_stem_odd_batch_and_wide():
    """Group fallback (B=3 -> G=1) and a 256-wide bucket."""
    from crnn_ocr_tpu.kernels.fused_stem import fused_stem_serve

    rng = np.random.default_rng(8)
    B, H, W, C = 3, 32, 256, 16
    img = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    conv_w = jnp.asarray(
        rng.normal(size=(3, 3, 1, C)).astype(np.float32) * 0.2
    )
    ones = jnp.ones(C, jnp.float32)
    zeros = jnp.zeros(C, jnp.float32)
    got = np.asarray(
        fused_stem_serve(img, conv_w, ones, zeros, zeros, ones,
                         interpret=True),
        np.float32,
    )
    ref = np.asarray(
        _xla_stem_ref(img, conv_w, ones, zeros, zeros, ones), np.float32
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_fused_stem_serve_f32_precision():
    """bf16=False keeps the conv matmuls in f32 (Precision.HIGHEST):
    parity with the XLA stem at f32 tolerance, not bf16's 2e-2."""
    from crnn_ocr_tpu.kernels.fused_stem import fused_stem_serve

    rng = np.random.default_rng(21)
    B, H, W, C = 2, 32, 48, 8
    img = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    conv_w = jnp.asarray(
        rng.normal(size=(3, 3, 1, C)).astype(np.float32) * 0.2
    )
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.uniform(0.5, 2.0, C).astype(np.float32))

    got = np.asarray(
        fused_stem_serve(img, conv_w, gamma, beta, mean, var,
                         interpret=True, out_dtype=jnp.float32,
                         bf16=False)
    )
    # f32 XLA reference (_xla_stem_ref is the bf16-mode one)
    y = jax.lax.conv_general_dilated(
        img, conv_w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    inv = gamma / jnp.sqrt(var + 1e-3)
    y = jnp.maximum(y * inv + (beta - mean * inv), 0.0)
    ref = np.asarray(jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_crnn_serve_with_fused_stem_matches_xla_path():
    """Full CRNN bf16 serve forward, fused stem (interpret) vs XLA stem."""
    import dataclasses

    from crnn_ocr_tpu.models import CRNN, ModelConfig

    cfg = ModelConfig(num_classes=11, width=128, dtype="bfloat16",
                      use_pallas_rnn=False, use_fused_stem=False)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 32, 128, 1)).astype(np.float32))

    ref_model = CRNN(cfg=cfg)
    variables = ref_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    want = np.asarray(ref_model.apply(variables, x, train=False))

    fused_model = CRNN(
        cfg=dataclasses.replace(cfg, use_fused_stem=True),
        pallas_interpret=True,
    )
    got = np.asarray(fused_model.apply(variables, x, train=False))
    # bf16 stem rounding differences pass through softmax: loose bf16-level
    # tolerance; identical param tree is the real invariant.
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)

    v2 = fused_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables
    )


@pytest.mark.slow
def test_fused_stem_train_matches_xla_reference():
    """fused_stem_train (interpret, f32): pooled/stats forward AND
    (d_w, d_gamma, d_beta) vs jax.grad of the XLA conv+batchBN+relu+pool
    — including first-max pool tie routing at relu zeros."""
    from crnn_ocr_tpu.kernels.fused_stem_train import fused_stem_train

    rng = np.random.default_rng(12)
    B, H, W, C = 4, 32, 48, 8  # smallest supported width: interpret is slow
    img = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    conv_w = jnp.asarray(
        rng.normal(size=(3, 3, 1, C)).astype(np.float32) * 0.3
    )
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    EPS = 1e-3

    def xla_ref(img, cw, g_, b_):
        y = jax.lax.conv_general_dilated(
            img, cw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y), axis=(0, 1, 2)) - mean * mean
        xh = (y - mean) * jax.lax.rsqrt(var + EPS)
        act = jnp.maximum(xh * g_ + b_, 0.0)
        p = jax.lax.reduce_window(
            act, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID",
        )
        return p, mean, var

    p_ref, m_ref, v_ref = xla_ref(img, conv_w, gamma, beta)
    p_got, m_got, v_got = fused_stem_train(
        img, conv_w, gamma, beta, EPS, False, True, None
    )
    np.testing.assert_allclose(np.asarray(m_got), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_got, np.float32),
                               np.asarray(p_ref), rtol=1e-5, atol=1e-5)

    def loss_ref(cw, g_, b_):
        p, _, _ = xla_ref(img, cw, g_, b_)
        return jnp.sum(jnp.sin(p * 1.7))

    def loss_fused(cw, g_, b_):
        p, _, _ = fused_stem_train(img, cw, g_, b_, EPS, False, True, None)
        return jnp.sum(jnp.sin(p.astype(jnp.float32) * 1.7))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(conv_w, gamma, beta)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(conv_w, gamma, beta)
    for a, b in zip(gf, gr):
        # d_w entries are O(60) sums with different f32 accumulation
        # order (band matmul vs conv transpose) -> ~1e-3 relative slack
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


@pytest.mark.slow
def test_crnn_train_step_with_fused_stem_matches_xla_path():
    """Full CRNN f32 train forward+backward+batch_stats: fused stem
    (interpret) == XLA stem at tight tolerance."""
    import dataclasses

    from crnn_ocr_tpu.models import CRNN, ModelConfig

    cfg0 = ModelConfig(
        num_classes=11, width=48, stem_filters=8,
        block_filters=(16, 16, 24, 24), time_dense_size=16, n_units=16,
        rnn_layers=1, dropout_rate=0.0, use_fused_stem=False,
    )
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(4, 32, 48, 1)).astype(np.float32))

    model_ref = CRNN(cfg=cfg0)
    variables = model_ref.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    model_fused = CRNN(
        cfg=dataclasses.replace(cfg0, use_fused_stem=True),
        pallas_interpret=True,
    )

    def loss_fn(model):
        def f(params, bs):
            out, upd = model.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(3)},
            )
            return jnp.sum(jnp.square(out)), upd["batch_stats"]

        return f

    (l_r, bs_r), g_r = jax.value_and_grad(loss_fn(model_ref),
                                          has_aux=True)(
        variables["params"], variables["batch_stats"]
    )
    (l_f, bs_f), g_f = jax.value_and_grad(loss_fn(model_fused),
                                          has_aux=True)(
        variables["params"], variables["batch_stats"]
    )
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs_f),
                    jax.tree_util.tree_leaves(bs_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
