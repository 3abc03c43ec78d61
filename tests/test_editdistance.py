"""On-device batched editdistance (SURVEY.md C9/C20 'vectorized JAX DP').

Parity contract: ``ops.editdistance.batched_levenshtein`` must agree with
the host DP (``utils.metrics._levenshtein_py``, itself parity-tested
against the C++ kernel) on every input, and evaluate(on_device_cer=True)
must reproduce the host text-space CER exactly (label<->char bijection)."""

import jax
import numpy as np
import pytest

from crnn_ocr_tpu.ops.editdistance import (
    batched_levenshtein,
    cer_sums_on_device,
)
from crnn_ocr_tpu.utils.metrics import _levenshtein_py


def _host(a, la, b, lb):
    return np.array(
        [
            _levenshtein_py(list(a[i, : la[i]]), list(b[i, : lb[i]]))
            for i in range(a.shape[0])
        ]
    )


@pytest.mark.parametrize(
    "seed,B,La,Lb,vocab",
    [(0, 32, 23, 17, 5), (1, 16, 8, 31, 2), (2, 8, 1, 1, 3)],
)
def test_batched_levenshtein_fuzz_vs_host(seed, B, La, Lb, vocab):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, vocab, (B, La)).astype(np.int32)
    b = rng.integers(0, vocab, (B, Lb)).astype(np.int32)
    la = rng.integers(0, La + 1, B).astype(np.int32)
    lb = rng.integers(0, Lb + 1, B).astype(np.int32)
    d = np.asarray(batched_levenshtein(a, la, b, lb))
    np.testing.assert_array_equal(d, _host(a, la, b, lb))


def test_degenerate_lengths():
    a = np.array([[1, 2, 3]], np.int32)
    b = np.array([[1, 9, 3, 4]], np.int32)
    z = np.zeros(1, np.int32)
    assert int(batched_levenshtein(a, z, b, z)[0]) == 0
    assert int(batched_levenshtein(a, np.array([3]), b, z)[0]) == 3
    assert int(batched_levenshtein(a, z, b, np.array([4]))[0]) == 4
    assert int(batched_levenshtein(a, np.array([1]), b, np.array([1]))[0]) == 0
    # garbage past the lengths must not matter
    a2 = a.copy()
    a2[0, 2] = 77
    assert int(
        batched_levenshtein(a2, np.array([2]), b, np.array([2]))[0]
    ) == int(batched_levenshtein(a, np.array([2]), b, np.array([2]))[0])


def test_cer_sums_from_dense_decode():
    dec = np.full((3, 6), -1, np.int32)
    dec[0, :3] = [1, 2, 3]
    dec[1, :2] = [1, 1]
    ref = np.array([[1, 2, 3], [2, 1, 0], [5, 0, 0]], np.int32)
    rl = np.array([3, 2, 1], np.int32)
    s, t = cer_sums_on_device(dec, ref, rl)
    assert int(s) == 0 + 1 + 1 and int(t) == 6


@pytest.mark.slow
def test_evaluate_on_device_cer_matches_host():
    from crnn_ocr_tpu.data.pipeline import device_batches, synthetic_batches
    from crnn_ocr_tpu.models import ModelConfig
    from crnn_ocr_tpu.train import create_train_state
    from crnn_ocr_tpu.train.loop import evaluate
    from crnn_ocr_tpu.train.step import make_eval_step

    from crnn_ocr_tpu.data.synthetic import (
        SyntheticConfig,
        SyntheticTextlines,
    )

    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=6)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=128,
        stem_filters=8,
        block_filters=(8, 8, 8, 8),
        time_dense_size=8,
        n_units=8,
        rnn_layers=1,
    )
    state = create_train_state(cfg, jax.random.key(0))
    eval_step = make_eval_step(cfg)

    def batches():
        return device_batches(
            synthetic_batches(
                batch_size=8, bucket=128, seed=3, steps=2, synth=synth
            )
        )

    host = evaluate(state, eval_step, batches(), synth.codec, max_batches=2)
    dev = evaluate(
        state,
        eval_step,
        batches(),
        synth.codec,
        max_batches=2,
        on_device_cer=True,
    )
    assert host["cer"] == pytest.approx(dev["cer"], abs=0)
    # codec-less eval now yields a real label-space CER, not NaN
    nocodec = evaluate(state, eval_step, batches(), None, max_batches=2)
    assert nocodec["cer"] == pytest.approx(host["cer"], abs=0)
    assert np.isnan(nocodec["wer"])
