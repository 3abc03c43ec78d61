"""CTC gradient parity vs Keras/TF (the north star's training-parity pillar):
at equal weights and identical inputs, d(mean ctc_batch_cost)/d(every weight)
must match TF's GradientTape result. Goldens from tools/gen_keras_parity.py
(31 tensors through conv/BN/GRU/dense, inference-mode BN)."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crnn_ocr_tpu.infer.h5_import import import_keras_h5
from crnn_ocr_tpu.models import CRNN
from crnn_ocr_tpu.ops import ctc
from tests.test_keras_parity import CASES

GOLDENS = pathlib.Path(__file__).parent / "goldens"


def _flax_grads():
    cfg = CASES["small_gru"]
    h5 = GOLDENS / "keras_small_gru_weights.h5"
    data = np.load(GOLDENS / "keras_small_gru_grads.npz")
    params, batch_stats = import_keras_h5(str(h5), cfg)
    model = CRNN(cfg=cfg)
    x = jnp.asarray(data["x"])
    labels = jnp.asarray(data["labels"])
    in_len = jnp.asarray(data["in_len"])
    lab_len = jnp.asarray(data["lab_len"])

    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        probs = jax.nn.softmax(logits[:, 2:, :], axis=-1)
        return jnp.mean(ctc.ctc_batch_cost(labels, probs, in_len, lab_len))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return cfg, data, float(loss), grads


@pytest.fixture(scope="module")
def parity():
    if not (GOLDENS / "keras_small_gru_grads.npz").exists():
        pytest.skip("run tools/gen_keras_parity.py")
    return _flax_grads()


def test_loss_value_matches(parity):
    _, data, loss, _ = parity
    np.testing.assert_allclose(loss, float(data["loss"]), rtol=1e-5)


def test_all_gradients_match(parity):
    cfg, data, _, grads = parity

    def want(key):
        return data[f"grad__{key}"]

    checks = [
        ("stem_conv__kernel", grads["stem_conv"]["kernel"]),
        ("stem_bn__gamma", grads["stem_bn"]["scale"]),
        ("stem_bn__beta", grads["stem_bn"]["bias"]),
        ("time_dense__kernel", grads["time_dense"]["kernel"]),
        ("time_dense__bias", grads["time_dense"]["bias"]),
        ("logits__kernel", grads["logits"]["kernel"]),
        ("logits__bias", grads["logits"]["bias"]),
    ]
    for i in range(len(cfg.block_filters)):
        g = grads[f"block{i}"]
        checks += [
            (
                f"block{i}_depthwise__depthwise_kernel",
                np.transpose(np.asarray(g["depthwise"]["kernel"]), (0, 1, 3, 2)),
            ),
            (f"block{i}_pointwise__kernel", g["pointwise"]["kernel"]),
            (f"block{i}_bn__gamma", g["BatchNorm_0"]["scale"]),
            (f"block{i}_bn__beta", g["BatchNorm_0"]["bias"]),
        ]
    for i in range(cfg.rnn_layers):
        g = grads[f"birnn{i}"]
        for d, dname in ((0, "forward"), (1, "backward")):
            checks += [
                (
                    f"birnn{i}__{dname}_gru__gru_cell__kernel",
                    np.asarray(g["kernel"])[d],
                ),
                (
                    f"birnn{i}__{dname}_gru__gru_cell__recurrent_kernel",
                    np.asarray(g["recurrent_kernel"])[d],
                ),
                (
                    f"birnn{i}__{dname}_gru__gru_cell__bias",
                    np.asarray(g["bias"])[d],
                ),
            ]
        checks += [
            (f"rnn_bn{i}__gamma", grads[f"rnn_bn{i}"]["scale"]),
            (f"rnn_bn{i}__beta", grads[f"rnn_bn{i}"]["bias"]),
        ]

    bad = []
    for key, got in checks:
        got = np.asarray(got)
        w = want(key)
        denom = np.maximum(np.abs(w).max(), 1e-6)
        err = np.abs(got - w).max() / denom
        if err > 2e-3:
            bad.append((key, float(err)))
    assert not bad, bad
    assert len(checks) == 31  # every trainable tensor covered