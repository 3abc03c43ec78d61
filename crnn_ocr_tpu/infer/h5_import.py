"""Keras .h5 weight importer: reference checkpoints -> flax param pytree.

The reference persists weights as Keras .h5 (SURVEY.md C19/C8). This module
maps them 1:1 onto crnn_ocr_tpu.models.CRNN's param/batch_stats trees for
equal-weights parity (forward outputs match to fp tolerance — validated by
tests/test_keras_parity.py against goldens from tools/gen_keras_parity.py).

Layout mapping (Keras -> flax):
  Conv2D kernel (kh,kw,in,out)           -> nn.Conv kernel, identical
  DepthwiseConv2D kernel (kh,kw,C,1)     -> grouped nn.Conv kernel (kh,kw,1,C)
  BatchNormalization gamma/beta/mm/mv    -> scale/bias + batch_stats mean/var
  Dense kernel/bias                      -> identical
  Bidirectional(GRU) fwd+bwd kernel (F,3H), recurrent (H,3H), bias (2,3H)
                                         -> stacked (2,F,3H)/(2,H,3H)/(2,2,3H)
  Bidirectional(LSTM) bias (4H,)         -> stacked (2,4H)

Weight identification uses each h5 layer group's stored ``weight_names``
order (stable across tf_keras versions: forward kernel, recurrent, bias,
then backward) rather than exact sublayer names, which drift between Keras
versions. Layer names must follow the canonical topology names
(stem_conv/stem_bn/block{i}_*/time_dense/birnn{i}/rnn_bn{i}/logits —
tools/keras_oracle.py); pass ``name_map`` to adapt foreign checkpoints
(e.g. the reference's auto-generated conv2d_1/... names, SURVEY.md §8.6).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def _read_h5_layers(path: str) -> Dict[str, List[np.ndarray]]:
    """Return {layer_name: [weights in saved order]} from a Keras .h5."""
    import h5py

    out: Dict[str, List[np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            n.decode() if isinstance(n, bytes) else n
            for n in g.attrs["layer_names"]
        ]
        for lname in layer_names:
            lg = g[lname]
            wnames = [
                n.decode() if isinstance(n, bytes) else n
                for n in lg.attrs.get("weight_names", [])
            ]
            if not wnames:
                continue
            out[lname] = [np.asarray(lg[w]) for w in wnames]
    return out


def import_keras_h5(
    path: str,
    model_cfg,
    name_map: Optional[Dict[str, str]] = None,
):
    """Load Keras .h5 weights into (params, batch_stats) for CRNN(cfg).

    ``name_map``: optional {canonical_name: h5_layer_name} overrides.
    """
    layers = _read_h5_layers(path)

    def get(layer: str) -> List[np.ndarray]:
        h5name = (name_map or {}).get(layer, layer)
        if h5name not in layers:
            raise KeyError(
                f"layer {h5name!r} not in h5 (has: {sorted(layers)})"
            )
        return layers[h5name]

    params: Dict = {}
    stats: Dict = {}

    def bn(dst_params: Dict, dst_stats: Dict, key: str, layer: str):
        gamma, beta, mean, var = get(layer)
        dst_params[key] = {"scale": gamma, "bias": beta}
        dst_stats[key] = {"mean": mean, "var": var}

    # STN front-end (reference C5/C8: loaded via custom_objects for the
    # sampler; the sampler itself has no weights — only the localization
    # CNN + theta head carry state)
    if getattr(model_cfg, "use_stn", False):
        stn: Dict = {}
        n_loc = 0
        while (name_map or {}).get(f"stn_conv{n_loc}", f"stn_conv{n_loc}") \
                in layers:
            n_loc += 1
        for i in range(n_loc):
            k, b = get(f"stn_conv{i}")
            stn[f"Conv_{i}"] = {"kernel": k, "bias": b}
        k, b = get("stn_dense")
        stn[f"Dense_0"] = {"kernel": k, "bias": b}
        k, b = get("stn_theta")
        stn[f"Dense_1"] = {"kernel": k, "bias": b}
        params["stn"] = stn

    # stem
    params["stem_conv"] = {"kernel": get("stem_conv")[0]}
    bn(params, stats, "stem_bn", "stem_bn")

    # depthwise-separable blocks
    for i in range(len(model_cfg.block_filters)):
        dw = get(f"block{i}_depthwise")[0]  # (kh,kw,C,1)
        pw = get(f"block{i}_pointwise")[0]
        blk_p: Dict = {
            "depthwise": {"kernel": np.transpose(dw, (0, 1, 3, 2))},
            "pointwise": {"kernel": pw},
        }
        blk_s: Dict = {}
        bn(blk_p, blk_s, "BatchNorm_0", f"block{i}_bn")
        params[f"block{i}"] = blk_p
        stats[f"block{i}"] = blk_s

    # time dense
    k, b = get("time_dense")
    params["time_dense"] = {"kernel": k, "bias": b}

    # bidirectional rnn layers
    for i in range(model_cfg.rnn_layers):
        w = get(f"birnn{i}")
        if len(w) != 6:
            raise ValueError(
                f"birnn{i}: expected 6 weight arrays (fwd/bwd x "
                f"kernel/recurrent/bias), got {len(w)}"
            )
        fk, fr, fb, bk, br, bb = w
        params[f"birnn{i}"] = {
            "kernel": np.stack([fk, bk]),
            "recurrent_kernel": np.stack([fr, br]),
            "bias": np.stack([fb, bb]),
        }
        bn(params, stats, f"rnn_bn{i}", f"rnn_bn{i}")

    # logits head
    k, b = get("logits")
    params["logits"] = {"kernel": k, "bias": b}

    import jax.numpy as jnp

    to_jnp = lambda t: jnp.asarray(t, jnp.float32)
    params = _tree_map_arrays(params, to_jnp)
    stats = _tree_map_arrays(stats, to_jnp)
    return params, stats


def _tree_map_arrays(tree, fn):
    if isinstance(tree, dict):
        return {k: _tree_map_arrays(v, fn) for k, v in tree.items()}
    return fn(tree)


def export_keras_h5(params, batch_stats, model_cfg, path: str) -> None:
    """Inverse of :func:`import_keras_h5`: write the flax CRNN weights as a
    legacy-format Keras .h5 that tf_keras ``load_weights`` (and this module)
    can read — lets reference users migrate in BOTH directions."""
    import h5py

    params = _tree_map_arrays(params, np.asarray)
    batch_stats = _tree_map_arrays(batch_stats, np.asarray)

    layers: "dict[str, list[tuple[str, np.ndarray]]]" = {}

    def bn(layer: str, p: dict, s: dict):
        layers[layer] = [
            (f"{layer}/gamma:0", p["scale"]),
            (f"{layer}/beta:0", p["bias"]),
            (f"{layer}/moving_mean:0", s["mean"]),
            (f"{layer}/moving_variance:0", s["var"]),
        ]

    if "stn" in params:
        stn = params["stn"]
        n_loc = sum(1 for k in stn if k.startswith("Conv_"))
        for i in range(n_loc):
            layers[f"stn_conv{i}"] = [
                (f"stn_conv{i}/kernel:0", stn[f"Conv_{i}"]["kernel"]),
                (f"stn_conv{i}/bias:0", stn[f"Conv_{i}"]["bias"]),
            ]
        layers["stn_dense"] = [
            ("stn_dense/kernel:0", stn["Dense_0"]["kernel"]),
            ("stn_dense/bias:0", stn["Dense_0"]["bias"]),
        ]
        layers["stn_theta"] = [
            ("stn_theta/kernel:0", stn["Dense_1"]["kernel"]),
            ("stn_theta/bias:0", stn["Dense_1"]["bias"]),
        ]
    layers["stem_conv"] = [
        ("stem_conv/kernel:0", params["stem_conv"]["kernel"])
    ]
    bn("stem_bn", params["stem_bn"], batch_stats["stem_bn"])
    for i in range(len(model_cfg.block_filters)):
        blk_p = params[f"block{i}"]
        blk_s = batch_stats[f"block{i}"]
        layers[f"block{i}_depthwise"] = [
            (
                f"block{i}_depthwise/depthwise_kernel:0",
                np.transpose(blk_p["depthwise"]["kernel"], (0, 1, 3, 2)),
            )
        ]
        layers[f"block{i}_pointwise"] = [
            (f"block{i}_pointwise/kernel:0", blk_p["pointwise"]["kernel"])
        ]
        bn(f"block{i}_bn", blk_p["BatchNorm_0"], blk_s["BatchNorm_0"])
    layers["time_dense"] = [
        ("time_dense/kernel:0", params["time_dense"]["kernel"]),
        ("time_dense/bias:0", params["time_dense"]["bias"]),
    ]
    cell = model_cfg.rnn_cell
    for i in range(model_cfg.rnn_layers):
        p = params[f"birnn{i}"]
        layers[f"birnn{i}"] = [
            (f"birnn{i}/forward_{cell}/{cell}_cell/kernel:0", p["kernel"][0]),
            (
                f"birnn{i}/forward_{cell}/{cell}_cell/recurrent_kernel:0",
                p["recurrent_kernel"][0],
            ),
            (f"birnn{i}/forward_{cell}/{cell}_cell/bias:0", p["bias"][0]),
            (f"birnn{i}/backward_{cell}/{cell}_cell/kernel:0", p["kernel"][1]),
            (
                f"birnn{i}/backward_{cell}/{cell}_cell/recurrent_kernel:0",
                p["recurrent_kernel"][1],
            ),
            (f"birnn{i}/backward_{cell}/{cell}_cell/bias:0", p["bias"][1]),
        ]
        bn(f"rnn_bn{i}", params[f"rnn_bn{i}"], batch_stats[f"rnn_bn{i}"])
    layers["logits"] = [
        ("logits/kernel:0", params["logits"]["kernel"]),
        ("logits/bias:0", params["logits"]["bias"]),
    ]

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [n.encode() for n in layers]
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.21.0"
        for lname, weights in layers.items():
            g = f.create_group(lname)
            g.attrs["weight_names"] = [wn.encode() for wn, _ in weights]
            for wn, arr in weights:
                g.create_dataset(wn, data=np.asarray(arr, np.float32))
