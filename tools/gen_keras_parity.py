"""Generate equal-weights parity goldens: Keras CRNN -> .h5 + input/output.

Builds a (small) reference-equivalent Keras CRNN with random-but-trained-like
weights, saves its weights as .h5 plus input batches and the Keras model's
softmax outputs. tests/test_keras_parity.py imports the .h5 through
crnn_ocr_tpu.infer.h5_import and asserts the flax model reproduces the
outputs — the "bit-for-bit at equal weights" forward contract.

Run: python tools/gen_keras_parity.py
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    from keras_oracle import build_keras_crnn

    rng = np.random.default_rng(20260816)

    cases = [
        dict(  # small GRU model
            name="small_gru",
            kwargs=dict(
                num_classes=12, width=64, stem_filters=8,
                block_filters=(16, 16, 24, 24), time_dense_size=16,
                n_units=12, rnn_layers=1, rnn_cell="gru",
            ),
        ),
        dict(  # small LSTM model, 2 layers
            name="small_lstm",
            kwargs=dict(
                num_classes=9, width=64, stem_filters=8,
                block_filters=(12, 16, 16, 24), time_dense_size=12,
                n_units=8, rnn_layers=2, rnn_cell="lstm",
            ),
        ),
        dict(  # flagship-shaped GRU (smaller units to keep files modest)
            name="mid_gru",
            kwargs=dict(
                num_classes=40, width=128, stem_filters=16,
                block_filters=(32, 48, 48, 64), time_dense_size=32,
                n_units=48, rnn_layers=2, rnn_cell="gru",
            ),
        ),
        dict(  # STN-enabled variant (config 3: affine grid sampling)
            name="small_stn",
            kwargs=dict(
                num_classes=12, width=64, stem_filters=8,
                block_filters=(16, 16, 24, 24), time_dense_size=16,
                n_units=12, rnn_layers=1, rnn_cell="gru", use_stn=True,
            ),
        ),
    ]

    for case in cases:
        model = build_keras_crnn(**case["kwargs"])
        # randomize ALL weights incl. BN moving stats (fresh init leaves
        # mean=0/var=1, too easy); keep magnitudes sane
        new_w = []
        for w in model.get_weights():
            if w.ndim == 1 and np.allclose(w, 1.0):  # gamma / var
                new_w.append((1.0 + 0.3 * rng.standard_normal(w.shape)).astype(np.float32) ** 2 + 0.1)
            elif w.ndim == 1:
                new_w.append((0.2 * rng.standard_normal(w.shape)).astype(np.float32))
            else:
                new_w.append(
                    (rng.standard_normal(w.shape) * 0.15).astype(np.float32)
                )
        model.set_weights(new_w)
        if case["kwargs"].get("use_stn"):
            # keep the theta head near identity: a wild random affine warps
            # everything to the clamped border (degenerate, trivially equal)
            lt = model.get_layer("stn_theta")
            k, b = lt.get_weights()
            lt.set_weights([
                (0.01 * rng.standard_normal(k.shape)).astype(np.float32),
                (np.array([1, 0, 0, 0, 1, 0], np.float32)
                 + 0.05 * rng.standard_normal(6).astype(np.float32)),
            ])

        h, wd = 32, case["kwargs"]["width"]
        x = rng.standard_normal((3, h, wd, 1)).astype(np.float32)
        y = model.predict(x, verbose=0)

        # NB: a ``.weights.h5`` suffix triggers tf_keras's Keras-3-style
        # format; a plain ``.h5`` name yields the legacy layer_names format
        # the reference era used (and h5_import.py parses).
        h5_path = os.path.join(OUT, f"keras_{case['name']}_weights.h5")
        model.save_weights(h5_path)

        # gradient goldens (small_gru only): d(mean ctc_batch_cost)/d(weights)
        # with the model in inference mode (BN moving stats, no dropout) —
        # the pure C12 gradient contract, no BN-update entanglement.
        if case["name"] == "small_gru":
            import tensorflow as tf
            from tf_keras import backend as KB

            ncls = case["kwargs"]["num_classes"]
            L = 4
            labels = rng.integers(0, ncls, (3, L)).astype(np.int32)
            lab_len = np.full((3, 1), L, np.int32)
            T_model = case["kwargs"]["width"] // 4
            in_len = np.full((3, 1), T_model - 2, np.int32)
            xt = tf.constant(x)
            with tf.GradientTape() as tape:
                probs = model(xt, training=False)
                loss = tf.reduce_mean(
                    KB.ctc_batch_cost(
                        labels, probs[:, 2:, :], in_len, lab_len
                    )
                )
            grads = tape.gradient(loss, model.trainable_variables)
            gblob = {"loss": np.float32(loss.numpy()),
                     "x": x, "labels": labels,
                     "in_len": in_len, "lab_len": lab_len}
            for v, g in zip(model.trainable_variables, grads):
                # name like "stem_conv/kernel:0"
                key = v.name.replace("/", "__").replace(":0", "")
                gblob[f"grad__{key}"] = g.numpy().astype(np.float32)
            np.savez(os.path.join(OUT, "keras_small_gru_grads.npz"), **gblob)
            print("wrote gradient goldens:", len(grads), "tensors,",
                  "loss", float(loss.numpy()))
        np.savez(
            os.path.join(OUT, f"keras_{case['name']}_io.npz"),
            x=x,
            y=y,
            **{f"cfg_{k}": np.asarray(v) for k, v in case["kwargs"].items()
               if not isinstance(v, (tuple, str))},
        )
        print(case["name"], "y", y.shape, "->", h5_path)

    # ---- reference-artifact migration golden: AUTO-NAMED layers ----
    # Mimics the reference's saved artifacts (architecture JSON + .h5 with
    # Keras auto-generated names + class map) for keras_json's zero-config
    # migration path (SURVEY.md C8, §8.6).
    for mig_name, mig_kwargs in [
        ("autonamed", dict(
            num_classes=12, width=64, stem_filters=8,
            block_filters=(16, 16, 24, 24), time_dense_size=16,
            n_units=12, rnn_layers=1, rnn_cell="gru", names=False,
        )),
        ("autonamed_stn", dict(
            num_classes=12, width=64, stem_filters=8,
            block_filters=(16, 16, 24, 24), time_dense_size=16,
            n_units=12, rnn_layers=1, rnn_cell="gru", use_stn=True,
            names=False,
        )),
    ]:
        model = build_keras_crnn(**mig_kwargs)
        new_w = []
        for w in model.get_weights():
            if w.ndim == 1 and np.allclose(w, 1.0):
                new_w.append((1.0 + 0.3 * rng.standard_normal(w.shape)).astype(np.float32) ** 2 + 0.1)
            elif w.ndim == 1:
                new_w.append((0.2 * rng.standard_normal(w.shape)).astype(np.float32))
            else:
                new_w.append((rng.standard_normal(w.shape) * 0.15).astype(np.float32))
        model.set_weights(new_w)
        if mig_kwargs.get("use_stn"):
            theta_layer = [l for l in model.layers
                           if getattr(l, "units", None) == 6][0]
            k, b = theta_layer.get_weights()
            theta_layer.set_weights([
                (0.01 * rng.standard_normal(k.shape)).astype(np.float32),
                (np.array([1, 0, 0, 0, 1, 0], np.float32)
                 + 0.05 * rng.standard_normal(6).astype(np.float32)),
            ])
        mig = os.path.join(OUT, f"migration_{mig_name}")
        os.makedirs(mig, exist_ok=True)
        model.save_weights(os.path.join(mig, "model.h5"))
        with open(os.path.join(mig, "model.json"), "w") as f:
            f.write(model.to_json())
        import json as _json

        alphabet = "0123456789ab"
        with open(os.path.join(mig, "classes.json"), "w") as f:
            _json.dump({c: i for i, c in enumerate(alphabet)}, f)
        x = rng.standard_normal((3, 32, 64, 1)).astype(np.float32)
        y = model.predict(x, verbose=0)
        np.savez(os.path.join(mig, "io.npz"), x=x, y=y)
        print(f"migration golden ({mig_name}):", mig)


if __name__ == "__main__":
    sys.exit(main())
