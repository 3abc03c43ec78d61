"""Equal-weights forward parity: Keras .h5 -> flax import -> same outputs.

The driver's north star requires matching the reference model's outputs
"bit-for-bit at equal weights". Goldens come from tools/gen_keras_parity.py
(reference-equivalent tf_keras models with randomized weights incl. BN
moving stats). The flax CRNN with imported weights must reproduce the Keras
softmax outputs to fp32 tolerance, and the whole decode pipeline must then
agree exactly.
"""

import pathlib

import jax
import numpy as np
import pytest

from crnn_ocr_tpu.infer.h5_import import import_keras_h5
from crnn_ocr_tpu.models import CRNN, ModelConfig
from crnn_ocr_tpu.ops import ctc

GOLDENS = pathlib.Path(__file__).parent / "goldens"

CASES = {
    "small_gru": ModelConfig(
        num_classes=12, width=64, stem_filters=8,
        block_filters=(16, 16, 24, 24), time_dense_size=16,
        n_units=12, rnn_layers=1, rnn_cell="gru", dropout_rate=0.0,
    ),
    "small_lstm": ModelConfig(
        num_classes=9, width=64, stem_filters=8,
        block_filters=(12, 16, 16, 24), time_dense_size=12,
        n_units=8, rnn_layers=2, rnn_cell="lstm", dropout_rate=0.0,
    ),
    "mid_gru": ModelConfig(
        num_classes=40, width=128, stem_filters=16,
        block_filters=(32, 48, 48, 64), time_dense_size=32,
        n_units=48, rnn_layers=2, rnn_cell="gru", dropout_rate=0.0,
    ),
    # config 3: STN variant — loc-CNN + theta head imported too (C5/C8)
    "small_stn": ModelConfig(
        num_classes=12, width=64, stem_filters=8,
        block_filters=(16, 16, 24, 24), time_dense_size=16,
        n_units=12, rnn_layers=1, rnn_cell="gru", dropout_rate=0.0,
        use_stn=True,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_equal_weights_forward_parity(name):
    h5 = GOLDENS / f"keras_{name}_weights.h5"
    io = GOLDENS / f"keras_{name}_io.npz"
    if not h5.exists():
        pytest.skip("run tools/gen_keras_parity.py")
    cfg = CASES[name]
    params, batch_stats = import_keras_h5(str(h5), cfg)
    data = np.load(io)
    x, y_keras = data["x"], data["y"]

    model = CRNN(cfg=cfg)
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )
    y = np.asarray(jax.nn.softmax(logits, axis=-1))
    assert y.shape == y_keras.shape
    np.testing.assert_allclose(y, y_keras, rtol=1e-4, atol=2e-5)


def test_equal_weights_decode_parity():
    """Through the decode pipeline: same weights -> same transcriptions."""
    name = "mid_gru"
    h5 = GOLDENS / f"keras_{name}_weights.h5"
    if not h5.exists():
        pytest.skip("run tools/gen_keras_parity.py")
    cfg = CASES[name]
    params, batch_stats = import_keras_h5(str(h5), cfg)
    data = np.load(GOLDENS / f"keras_{name}_io.npz")
    x, y_keras = data["x"], data["y"]

    model = CRNN(cfg=cfg)
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    B, T, _ = probs.shape
    in_len = np.full((B,), T, np.int32)
    ours, _ = ctc.ctc_greedy_decode(probs[:, 2:, :], in_len - 2)
    theirs, _ = ctc.ctc_greedy_decode(y_keras[:, 2:, :], in_len - 2)
    assert ctc.trim_dense(ours) == ctc.trim_dense(theirs)


def test_h5_export_import_roundtrip(tmp_path):
    """flax -> export_keras_h5 -> import_keras_h5 -> identical trees."""
    from crnn_ocr_tpu.infer.h5_import import export_keras_h5
    from crnn_ocr_tpu.train import create_train_state

    cfg = CASES["small_gru"]
    state = create_train_state(cfg, jax.random.key(3))
    path = str(tmp_path / "export.h5")
    export_keras_h5(state.params, state.batch_stats, cfg, path)
    params, stats = import_keras_h5(path, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(state.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params))
    for k, v in flat_a:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_b[k]), rtol=0, atol=0,
            err_msg=str(k),
        )
    flat_sa = jax.tree_util.tree_leaves_with_path(state.batch_stats)
    flat_sb = dict(jax.tree_util.tree_leaves_with_path(stats))
    for k, v in flat_sa:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_sb[k]), err_msg=str(k)
        )


def test_h5_import_name_map(tmp_path):
    """Foreign checkpoints with different layer names import via name_map
    (the path reference .h5 files with auto-generated names will use)."""
    import h5py

    from crnn_ocr_tpu.infer.h5_import import export_keras_h5
    from crnn_ocr_tpu.train import create_train_state

    cfg = CASES["small_gru"]
    state = create_train_state(cfg, jax.random.key(9))
    src = str(tmp_path / "canonical.h5")
    export_keras_h5(state.params, state.batch_stats, cfg, src)

    # rewrite with "foreign" layer names (keras-auto style)
    dst = str(tmp_path / "foreign.h5")
    rename = {}
    with h5py.File(src, "r") as fi, h5py.File(dst, "w") as fo:
        dec = lambda n: n.decode() if isinstance(n, bytes) else n
        names = [dec(n) for n in fi.attrs["layer_names"]]
        new_names = []
        for i, n in enumerate(names):
            nn = f"layer_{i}"
            rename[n] = nn
            new_names.append(nn)
            gi = fi[n]
            go = fo.create_group(nn)
            go.attrs["weight_names"] = gi.attrs["weight_names"]
            for wn in [dec(w) for w in gi.attrs["weight_names"]]:
                go.create_dataset(wn, data=np.asarray(gi[wn]))
        fo.attrs["layer_names"] = [n.encode() for n in new_names]
        fo.attrs["backend"] = b"tensorflow"
        fo.attrs["keras_version"] = b"2.21.0"

    params, stats = import_keras_h5(dst, cfg, name_map=rename)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("variant", ["autonamed", "autonamed_stn"])
def test_reference_artifact_migration_zero_config(variant):
    """SURVEY.md C8/§8.6: a reference-style artifact dir (architecture JSON
    + .h5 with Keras AUTO-GENERATED layer names + class map) must import
    with zero manual mapping and reproduce the Keras outputs + decodes."""
    from crnn_ocr_tpu.infer.keras_json import (
        infer_name_map_from_h5,
        load_reference_model,
        model_config_from_keras_json,
    )

    mig = GOLDENS / f"migration_{variant}"
    if not mig.exists():
        pytest.skip("run tools/gen_keras_parity.py")

    cfg, params, batch_stats, codec = load_reference_model(str(mig))
    assert cfg.num_classes == 12 and cfg.rnn_cell == "gru"
    assert cfg.use_stn == variant.endswith("stn")
    assert codec is not None and codec.num_classes == 12
    # migrated artifacts are stamped: keys the Predictor's default beam
    # extraction semantics (K.ctc_decode parity for THESE models only)
    assert cfg.provenance == "keras_migrated"

    data = np.load(mig / "io.npz")
    x, y_keras = data["x"], data["y"]
    model = CRNN(cfg=cfg)
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )
    y = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(y, y_keras, rtol=1e-4, atol=2e-5)

    # decode parity end-to-end on the imported model
    T = y.shape[1]
    il = np.full((y.shape[0],), T, np.int32)
    dec_j, _ = ctc.ctc_decode(y, il, greedy=True)
    dec_k, _ = ctc.ctc_decode(y_keras, il, greedy=True)
    assert ctc.trim_dense(dec_j[0]) == ctc.trim_dense(dec_k[0])

    # the h5-only path (no JSON) must reconstruct the same mapping
    cfg2, nm2 = infer_name_map_from_h5(str(mig / "model.h5"))
    cfg1, nm1 = model_config_from_keras_json(str(mig / "model.json"))
    assert nm1 == nm2
    assert cfg2.block_filters == cfg1.block_filters
    assert cfg2.n_units == cfg1.n_units
    assert cfg2.use_stn == cfg1.use_stn


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["autonamed", "autonamed_stn"])
def test_migrate_cli_roundtrip(tmp_path, monkeypatch, variant):
    """crnn-ocr-migrate import -> predictor-loadable TPU model dir ->
    export -> reference-style artifacts that re-import identically; and
    init_predictor on the RAW reference dir (no conversion step)."""
    mig = GOLDENS / f"migration_{variant}"
    if not mig.exists():
        pytest.skip("run tools/gen_keras_parity.py")
    import crnn_ocr_tpu.cli.migrate as migrate
    from crnn_ocr_tpu.infer import init_predictor
    from crnn_ocr_tpu.infer.keras_json import load_reference_model

    # keep the test hermetic: arch-JSON export needs tf_keras (the
    # builder itself is oracle-covered by tools/gen_keras_parity.py)
    monkeypatch.setattr(migrate, "_write_arch_json", lambda cfg, p: False)

    dest = tmp_path / "tpu_model"
    assert migrate.main(["import", "--src", str(mig),
                         "--dest", str(dest)]) == 0

    data = np.load(mig / "io.npz")
    x, y_keras = data["x"], data["y"]

    def probs_of(pred):
        m = CRNN(cfg=pred.cfg)
        logits = m.apply(pred._vars, x, train=False)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    pred = init_predictor(str(dest))  # converted dir
    np.testing.assert_allclose(probs_of(pred), y_keras,
                               rtol=1e-4, atol=2e-5)

    pred_raw = init_predictor(str(mig))  # raw reference dir, no convert
    np.testing.assert_allclose(probs_of(pred_raw), y_keras,
                               rtol=1e-4, atol=2e-5)

    out = tmp_path / "ref_out"
    assert migrate.main(["export", "--src", str(dest),
                         "--dest", str(out)]) == 0
    assert (out / "classes.pkl").exists()
    cfg3, params3, stats3, codec3 = load_reference_model(str(out))
    assert codec3 is not None and codec3.num_classes == pred.cfg.num_classes
    m3 = CRNN(cfg=cfg3)
    y3 = np.asarray(jax.nn.softmax(
        m3.apply({"params": params3, "batch_stats": stats3}, x,
                 train=False), axis=-1))
    np.testing.assert_allclose(y3, y_keras, rtol=1e-4, atol=2e-5)


def test_infer_name_map_rejects_mispooled_h5(tmp_path):
    """VERDICT r2 #5: a bare .h5 whose pooling differs from the assumed
    height-32 ladder must FAIL LOUDLY (the time_dense kernel input dim
    pins final_h x channels), not import cleanly and decode garbage."""
    import shutil

    import h5py

    from crnn_ocr_tpu.infer.keras_json import infer_name_map_from_h5

    src = GOLDENS / "migration_autonamed" / "model.h5"
    if not src.exists():
        pytest.skip("run tools/gen_keras_parity.py")
    dst = tmp_path / "mispooled.h5"
    shutil.copy(src, dst)
    with h5py.File(dst, "r+") as f:
        g = f["model_weights"] if "model_weights" in f else f
        lg = g["dense"]  # the time_dense layer in the golden
        k = np.asarray(lg["dense/kernel:0"])
        # double the input dim: the model this came from pooled height to
        # final_h=2, not 1 — incompatible with the assumed ladder
        del lg["dense/kernel:0"]
        lg.create_dataset(
            "dense/kernel:0", data=np.concatenate([k, k], axis=0)
        )
    with pytest.raises(ValueError, match="pool"):
        infer_name_map_from_h5(str(dst))
    # and the pristine file still passes the validation
    with pytest.warns(UserWarning, match="WIDTH"):
        cfg, _ = infer_name_map_from_h5(str(src))
    assert cfg.block_filters == (16, 16, 24, 24)


def test_infer_name_map_width_pools_are_an_unverifiable_assumption():
    """Characterizes the documented bare-.h5 limitation (MIGRATION.md,
    keras_json.py): WIDTH pools after the first block change only the
    timestep count — no kernel/bias shape records them — so a model that
    really used (2,2) width pools in later blocks produces an .h5 that is
    SHAPE-IDENTICAL to the assumed-(2,1) one. Inference therefore cannot
    reject it; the contract is (a) the import always assumes (2,1) width
    pools, and (b) every bare-.h5 inference emits a loud warning naming
    the assumption and the architecture-JSON override."""
    from crnn_ocr_tpu.infer.keras_json import infer_name_map_from_h5
    from crnn_ocr_tpu.models import CRNN, ModelConfig

    src = GOLDENS / "migration_autonamed" / "model.h5"
    if not src.exists():
        pytest.skip("run tools/gen_keras_parity.py")
    with pytest.warns(UserWarning, match=r"WIDTH.*ASSUMED|ASSUMED.*WIDTH"):
        cfg, _ = infer_name_map_from_h5(str(src))
    # (a) the assumption: stem (2,2), all later blocks (2,1) width pools
    assert cfg.block_pools[0] == (2, 2)
    assert all(p == (2, 1) for p in cfg.block_pools[1:])
    # (b) shape-identity of the width-mispooled twin: a config differing
    # ONLY in later width pools initializes the EXACT same parameter
    # shapes, so no shape check can ever distinguish them from weights.
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg_mis = dataclasses.replace(
        cfg,
        block_pools=(cfg.block_pools[0],)
        + tuple((ph, 2) for ph, _ in cfg.block_pools[1:]),
        width=128,
    )
    cfg_ok = dataclasses.replace(cfg, width=128)
    x = jnp.zeros((1, cfg_ok.height, 128, 1), jnp.float32)
    shapes = []
    for c in (cfg_ok, cfg_mis):
        v = CRNN(cfg=c).init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, train=False,
        )
        shapes.append(
            jax.tree.map(lambda a: jnp.shape(a), v["params"])
        )
    assert shapes[0] == shapes[1]
