"""Reference-equivalent tf_keras CRNN builder (the equal-weights oracle).

One topology, two frameworks: this Keras graph mirrors crnn_ocr_tpu.models
CRNN layer-for-layer (SURVEY.md C4 pins the reference's topology class) with
explicit layer names that crnn_ocr_tpu.infer.h5_import maps 1:1 onto the
flax param tree. Used to (a) measure the CPU baseline, (b) generate
equal-weights forward-parity goldens, (c) stand in for reference .h5
checkpoints until the reference mount provides real ones (SURVEY.md §8.6).
"""

from __future__ import annotations


def make_bilinear_sampler():
    """Keras layer replicating crnn_ocr_tpu.ops.grid_sample semantics
    (align_corners=True normalized coords, border-clamped indices, corner
    weights from unclipped positions) — the reference's backend-ops STN
    sampler (SURVEY.md C5/C17), for equal-weights STN parity."""
    import tensorflow as tf
    from tf_keras import layers as L

    class BilinearSampler(L.Layer):
        def call(self, inputs):
            img, theta = inputs
            H = img.shape[1]
            W = img.shape[2]
            theta = tf.reshape(theta, (-1, 2, 3))
            ys = tf.linspace(-1.0, 1.0, H)
            xs = tf.linspace(-1.0, 1.0, W)
            gx, gy = tf.meshgrid(xs, ys)  # (H, W)
            t = theta[:, :, :, None, None]
            src_x = t[:, 0, 0] * gx + t[:, 0, 1] * gy + t[:, 0, 2]
            src_y = t[:, 1, 0] * gx + t[:, 1, 1] * gy + t[:, 1, 2]
            x = (src_x + 1.0) * (W - 1) / 2.0  # (B, H, W)
            y = (src_y + 1.0) * (H - 1) / 2.0
            x0f = tf.floor(x)
            y0f = tf.floor(y)
            wx1 = x - x0f
            wy1 = y - y0f
            x0 = tf.clip_by_value(tf.cast(x0f, tf.int32), 0, W - 1)
            x1 = tf.clip_by_value(tf.cast(x0f, tf.int32) + 1, 0, W - 1)
            y0 = tf.clip_by_value(tf.cast(y0f, tf.int32), 0, H - 1)
            y1 = tf.clip_by_value(tf.cast(y0f, tf.int32) + 1, 0, H - 1)
            flat = tf.reshape(img, (tf.shape(img)[0], H * W, img.shape[3]))

            def take(yy, xx):
                idx = yy * W + xx  # (B, H, W)
                return tf.gather(flat, tf.reshape(idx, (tf.shape(idx)[0], -1)),
                                 batch_dims=1)  # (B, H*W, C)

            v00, v01 = take(y0, x0), take(y0, x1)
            v10, v11 = take(y1, x0), take(y1, x1)
            w00 = tf.reshape((1 - wy1) * (1 - wx1), (-1, H * W, 1))
            w01 = tf.reshape((1 - wy1) * wx1, (-1, H * W, 1))
            w10 = tf.reshape(wy1 * (1 - wx1), (-1, H * W, 1))
            w11 = tf.reshape(wy1 * wx1, (-1, H * W, 1))
            out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
            return tf.reshape(out, (-1, H, W, img.shape[3]))

    return BilinearSampler


def build_keras_crnn(
    num_classes: int = 80,
    height: int = 32,
    width: int = 128,
    stem_filters: int = 64,
    block_filters=(128, 256, 256, 512),
    block_pools=((2, 2), (2, 1), (2, 1), (2, 1)),
    time_dense_size: int = 128,
    n_units: int = 256,
    rnn_layers: int = 2,
    rnn_cell: str = "gru",
    use_stn: bool = False,
    stn_loc_filters=(16, 32),
    stn_loc_dense: int = 50,
    names: bool = True,
):
    # names=False -> Keras auto-generated layer names (conv2d_1, ...),
    # mimicking the reference's unnamed layers for migration tests
    import tf_keras as keras
    from tf_keras import layers as L

    _n = (lambda s: s) if names else (lambda s: None)
    inp = keras.Input(shape=(height, width, 1), name=_n("the_input"))
    x = inp
    if use_stn:
        import numpy as _np

        h = L.MaxPooling2D((2, 2))(x)
        for i, f in enumerate(stn_loc_filters):
            h = L.Conv2D(f, 5, padding="same", activation="relu",
                         name=_n(f"stn_conv{i}"))(h)
            h = L.MaxPooling2D((2, 2))(h)
        h = L.Flatten()(h)
        h = L.Dense(stn_loc_dense, activation="relu", name=_n("stn_dense"))(h)
        theta = L.Dense(
            6,
            kernel_initializer="zeros",
            bias_initializer=keras.initializers.Constant(
                _np.array([1, 0, 0, 0, 1, 0], _np.float32)
            ),
            name=_n("stn_theta"),
        )(h)
        x = make_bilinear_sampler()(name=_n("stn_sampler"))([x, theta])
    x = L.Conv2D(
        stem_filters, 3, padding="same", use_bias=False, name=_n("stem_conv"
    ))(x)
    x = L.BatchNormalization(name=_n("stem_bn"))(x)
    x = L.Activation("relu")(x)
    x = L.MaxPooling2D((2, 2))(x)
    for i, (filters, pool) in enumerate(zip(block_filters, block_pools)):
        x = L.DepthwiseConv2D(
            3, padding="same", use_bias=False, name=_n(f"block{i}_depthwise"
        ))(x)
        x = L.Conv2D(
            filters, 1, use_bias=False, name=_n(f"block{i}_pointwise"
        ))(x)
        x = L.BatchNormalization(name=_n(f"block{i}_bn"))(x)
        x = L.Activation("relu")(x)
        x = L.MaxPooling2D(pool)(x)
    feat = int(x.shape[1]) * int(x.shape[3])
    T = int(x.shape[2])
    x = L.Permute((2, 1, 3))(x)
    x = L.Reshape((T, feat))(x)
    x = L.Dense(time_dense_size, activation="relu", name=_n("time_dense"))(x)
    cell = L.GRU if rnn_cell == "gru" else L.LSTM
    for i in range(rnn_layers):
        x = L.Bidirectional(
            cell(n_units, return_sequences=True), name=_n(f"birnn{i}"
        ))(x)
        x = L.BatchNormalization(name=_n(f"rnn_bn{i}"))(x)
    out = L.Dense(num_classes + 1, activation="softmax", name=_n("logits"))(x)
    return keras.Model(inp, out)
