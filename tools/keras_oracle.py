"""Reference-equivalent tf_keras CRNN builder (the equal-weights oracle).

One topology, two frameworks: this Keras graph mirrors crnn_ocr_tpu.models
CRNN layer-for-layer (SURVEY.md C4 pins the reference's topology class) with
explicit layer names that crnn_ocr_tpu.infer.h5_import maps 1:1 onto the
flax param tree. Used to (a) measure the CPU baseline, (b) generate
equal-weights forward-parity goldens, (c) stand in for reference .h5
checkpoints until the reference mount provides real ones (SURVEY.md §8.6).
"""

from __future__ import annotations


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
):
    import tf_keras as keras
    from tf_keras import layers as L

    inp = keras.Input(shape=(height, width, 1), name="the_input")
    x = L.Conv2D(
        stem_filters, 3, padding="same", use_bias=False, name="stem_conv"
    )(inp)
    x = L.BatchNormalization(name="stem_bn")(x)
    x = L.Activation("relu")(x)
    x = L.MaxPooling2D((2, 2))(x)
    for i, (filters, pool) in enumerate(zip(block_filters, block_pools)):
        x = L.DepthwiseConv2D(
            3, padding="same", use_bias=False, name=f"block{i}_depthwise"
        )(x)
        x = L.Conv2D(
            filters, 1, use_bias=False, name=f"block{i}_pointwise"
        )(x)
        x = L.BatchNormalization(name=f"block{i}_bn")(x)
        x = L.Activation("relu")(x)
        x = L.MaxPooling2D(pool)(x)
    feat = int(x.shape[1]) * int(x.shape[3])
    T = int(x.shape[2])
    x = L.Permute((2, 1, 3))(x)
    x = L.Reshape((T, feat))(x)
    x = L.Dense(time_dense_size, activation="relu", name="time_dense")(x)
    cell = L.GRU if rnn_cell == "gru" else L.LSTM
    for i in range(rnn_layers):
        x = L.Bidirectional(
            cell(n_units, return_sequences=True), name=f"birnn{i}"
        )(x)
        x = L.BatchNormalization(name=f"rnn_bn{i}")(x)
    out = L.Dense(num_classes + 1, activation="softmax", name="logits")(x)
    return keras.Model(inp, out)
