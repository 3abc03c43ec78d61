"""Full-loop training parity: tf_keras vs crnn_ocr_tpu, step by step.

Trains the SAME tiny CRNN (identical initial weights via export_keras_h5,
identical batches, same Adam hyperparams, no dropout/clipping, exact-Keras
CTC loss mode) for N steps in both frameworks and prints the per-step loss
trajectories side by side. Gradient parity is already a golden test
(tests/test_grad_parity.py); this demonstrates the whole fit loop replicates
(losses track until fp accumulation slowly decorrelates them).

Run: python tools/compare_training.py [--steps 20]
"""

import argparse
import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import tensorflow as tf
    from tf_keras import backend as KB

    from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
    from crnn_ocr_tpu.data.pipeline import device_batches, synthetic_batches
    from crnn_ocr_tpu.infer.h5_import import export_keras_h5
    from crnn_ocr_tpu.models import CRNN, ModelConfig
    from crnn_ocr_tpu.train.state import TrainState
    from keras_oracle import build_keras_crnn

    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=5)
    )
    kw = dict(
        num_classes=synth.codec.num_classes,
        width=128,
        stem_filters=8,
        block_filters=(16, 16, 24, 24),
        time_dense_size=16,
        n_units=12,
        rnn_layers=1,
    )
    cfg = ModelConfig(dropout_rate=0.0, **kw)
    model = CRNN(cfg=cfg)

    # identical init: flax init -> export -> keras load
    x0 = jnp.zeros((args.batch, 32, 128, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False,
    )
    export_keras_h5(
        variables["params"], variables["batch_stats"], cfg, "/tmp/cmp_init.h5"
    )
    kmodel = build_keras_crnn(**kw)
    kmodel.load_weights("/tmp/cmp_init.h5")

    # identical batches: device-preprocessed, materialized once
    batches = []
    for b in device_batches(
        synthetic_batches(
            batch_size=args.batch, bucket=128, steps=args.steps, synth=synth
        ),
        prefetch=0,
    ):
        batches.append(
            {
                "x": np.asarray(b["x"]),
                "labels": np.asarray(b["the_labels"]),
                "in_len": np.asarray(b["input_length"]),
                "lab_len": np.asarray(b["label_length"]),
            }
        )

    # ---- keras side: manual loop, same Adam ----
    import tf_keras

    kopt = tf_keras.optimizers.Adam(args.lr)
    k_losses = []
    for b in batches:
        xt = tf.constant(b["x"][..., None])
        with tf.GradientTape() as tape:
            probs = kmodel(xt, training=True)
            loss = tf.reduce_mean(
                KB.ctc_batch_cost(
                    b["labels"],
                    probs[:, 2:, :],
                    b["in_len"][:, None],
                    b["lab_len"][:, None],
                )
            )
        grads = tape.gradient(loss, kmodel.trainable_variables)
        kopt.apply_gradients(zip(grads, kmodel.trainable_variables))
        k_losses.append(float(loss.numpy()))

    # ---- our side: same Adam (keras epsilon=1e-7), exact keras loss ----
    from crnn_ocr_tpu.train import step as step_lib

    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=optax.adam(args.lr, eps=1e-7),
        batch_stats=variables["batch_stats"],
    )
    train_step = step_lib.make_train_step(cfg, exact_keras=True, donate=False)
    rng = jax.random.key(0)
    j_losses = []
    for b in batches:
        batch = {
            "x": jnp.asarray(b["x"]),
            "the_labels": jnp.asarray(b["labels"]),
            "input_length": jnp.asarray(b["in_len"]),
            "label_length": jnp.asarray(b["lab_len"]),
        }
        state, m = train_step(state, batch, rng)
        j_losses.append(float(m["loss"]))

    print(f"{'step':>4} {'keras':>10} {'ours':>10} {'rel diff':>9}")
    for i, (a, c) in enumerate(zip(k_losses, j_losses)):
        print(f"{i:4d} {a:10.4f} {c:10.4f} {abs(a-c)/max(abs(a),1e-6):9.2%}")
    rel = [abs(a - c) / max(abs(a), 1e-6) for a, c in zip(k_losses, j_losses)]
    print(
        f"first-5 mean rel diff {np.mean(rel[:5]):.3%}; "
        f"overall mean {np.mean(rel):.3%}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
