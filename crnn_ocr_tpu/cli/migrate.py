"""Model-artifact migration CLI (reference C8 file layout, both ways).

The reference persists models as architecture JSON + ``.h5`` weights +
pickled class map (SURVEY.md C8, ``utils.py#init_predictor``). This
framework persists orbax checkpoints + ``model_config.json`` +
``classes.json``. Two subcommands bridge them:

``import``
    Reference Keras artifact dir -> TPU-native model dir. Zero-config:
    architecture/name mapping comes from the Keras JSON when present, else
    is inferred from the .h5 weight shapes (infer/keras_json.py). The
    output dir works with ``crnn-ocr-predict --model`` AND
    ``crnn-ocr-train --resume`` (a full train state with fresh optimizer
    slots is written, so migrated weights can be fine-tuned).

``export``
    TPU-native model dir -> reference-style dir: legacy-format ``model.h5``
    (tf_keras ``load_weights``-compatible), ``classes.pkl`` (the
    reference's pickle format) + ``classes.json``, and — when tf_keras and
    the repo's oracle builder are importable — the architecture
    ``model.json`` so the reference's own ``model_from_json`` loader works.

Usage:
    crnn-ocr-migrate import --src ref_model_dir --dest tpu_model_dir
    crnn-ocr-migrate export --src tpu_model_dir --dest out_dir [--step N]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys


def _do_import(args) -> int:
    import jax

    from crnn_ocr_tpu.infer.keras_json import load_reference_model
    from crnn_ocr_tpu.train.checkpoint import CheckpointManager
    from crnn_ocr_tpu.train.state import create_train_state, param_count

    cfg, params, batch_stats, codec = load_reference_model(
        args.src, json_name=args.json, h5_name=args.h5,
        classes_name=args.classes,
    )
    if codec is None:
        print(
            f"no class map (classes.pkl / classes.json) in {args.src}; "
            "pass --classes", file=sys.stderr,
        )
        return 1
    state = create_train_state(cfg, jax.random.key(0))
    state = state.replace(params=params, batch_stats=batch_stats)
    mgr = CheckpointManager(args.dest)
    mgr.save(0, state, model_cfg=cfg, codec=codec)
    mgr.wait()
    print(
        f"imported {param_count(state):,} params -> {args.dest} "
        f"(num_classes={cfg.num_classes}, rnn={cfg.rnn_cell}, "
        f"stn={cfg.use_stn})"
    )
    return 0


def _write_arch_json(cfg, path: str) -> bool:
    """Reference-loadable architecture JSON via the tf_keras oracle
    builder; returns False (skipped) when tf_keras or the repo's
    ``tools/`` dir is unavailable (e.g. installed-wheel runs)."""
    try:
        from tools.keras_oracle import build_keras_crnn
    except ImportError:
        return False
    model = build_keras_crnn(
        num_classes=cfg.num_classes,
        height=cfg.height,
        width=cfg.width,
        stem_filters=cfg.stem_filters,
        block_filters=tuple(cfg.block_filters),
        block_pools=tuple(tuple(p) for p in cfg.block_pools),
        time_dense_size=cfg.time_dense_size,
        n_units=cfg.n_units,
        rnn_layers=cfg.rnn_layers,
        rnn_cell=cfg.rnn_cell,
        use_stn=cfg.use_stn,
    )
    with open(path, "w") as f:
        f.write(model.to_json())
    return True


def _do_export(args) -> int:
    import jax

    from crnn_ocr_tpu.infer.h5_import import export_keras_h5
    from crnn_ocr_tpu.train.checkpoint import (
        CheckpointManager,
        load_codec,
        load_model_config,
    )
    from crnn_ocr_tpu.train.state import create_train_state

    cfg = load_model_config(args.src)
    codec = load_codec(args.src)
    template = create_train_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(args.src)
    params, batch_stats = mgr.restore_inference(
        template.params, template.batch_stats, step=args.step
    )
    os.makedirs(args.dest, exist_ok=True)
    export_keras_h5(
        params, batch_stats, cfg, os.path.join(args.dest, "model.h5")
    )
    with open(os.path.join(args.dest, "classes.pkl"), "wb") as f:
        pickle.dump(dict(codec.classes), f)
    codec.save(os.path.join(args.dest, "classes.json"))
    wrote_json = _write_arch_json(
        cfg, os.path.join(args.dest, "model.json")
    )
    note = "" if wrote_json else (
        " (model.json skipped: tf_keras oracle builder not importable)"
    )
    print(f"exported model.h5 + classes.[pkl|json] -> {args.dest}{note}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="crnn-ocr-migrate",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser(
        "import", help="reference Keras artifacts -> TPU model dir"
    )
    pi.add_argument("--src", required=True,
                    help="dir with .h5 (+ optional arch JSON + class map)")
    pi.add_argument("--dest", required=True, help="output model dir")
    pi.add_argument("--json", help="architecture JSON filename in --src")
    pi.add_argument("--h5", help=".h5 weights filename in --src")
    pi.add_argument("--classes", help="class-map filename in --src")
    pe = sub.add_parser(
        "export", help="TPU model dir -> reference-style Keras artifacts"
    )
    pe.add_argument("--src", required=True, help="TPU model dir")
    pe.add_argument("--dest", required=True, help="output artifact dir")
    pe.add_argument("--step", type=int,
                    help="checkpoint step (default: latest)")
    args = p.parse_args(argv)
    if args.cmd == "import":
        return _do_import(args)
    return _do_export(args)


if __name__ == "__main__":
    sys.exit(main())
