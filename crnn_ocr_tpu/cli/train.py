"""Training CLI (reference L3: ``python3 train.py --flags``, SURVEY.md C10).

Flag set mirrors the reference's knobs (paths/annotations, save dir, epochs/
steps, batch size, --n_units, --time_dense_size, optimizer, --norm, --stn,
GRU/LSTM, dataset layout, early stopping) plus TPU-native ones (mesh size,
bf16, loss mode). ``--dataset synthetic`` trains on the built-in glyph task
(no corpus needed — this environment has no IAM mount).

Examples:
  python -m crnn_ocr_tpu.cli.train --dataset synthetic --steps 500 \
      --save_path /tmp/model
  python -m crnn_ocr_tpu.cli.train --path /data/iam \
      --annotation annotation.txt --steps 20000 --save_path /models/iam
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # data
    p.add_argument("--dataset", default="files",
                   choices=["files", "synthetic", "fonts"])
    p.add_argument("--path", help="image directory (files dataset)")
    p.add_argument("--annotation", default="annotation.txt")
    p.add_argument(
        "--layout", default="annotation", choices=["annotation", "filename"]
    )
    p.add_argument("--val_fraction", type=float, default=0.1)
    p.add_argument("--limit", type=int, default=0,
                   help="files dataset: cap the sample list (0 = all); "
                        "quick smoke runs over a large corpus")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_label_len", type=int, default=32)
    p.add_argument(
        "--buckets", type=int, nargs="+", default=[64, 128, 192, 256]
    )
    p.add_argument("--no-norm", dest="norm", action="store_false",
                   help="disable per-image normalization")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--font_noise", type=float, default=0.02,
                   help="--dataset fonts: render-time noise std "
                        "(fraction of 255)")
    p.add_argument("--font_min_words", type=int, default=1,
                   help="--dataset fonts: words per line, lower bound")
    p.add_argument("--font_max_words", type=int, default=2,
                   help="--dataset fonts: words per line, upper bound")
    p.add_argument("--pack_cache", action="store_true",
                   help="files dataset: decode each image ONCE into mmap "
                        "shards under <path>/.crnn_pack/, then feed every "
                        "epoch decode-free (data/packed.py — removes the "
                        "host PNG-decode bottleneck, SURVEY.md §3.5)")
    p.add_argument("--device_cache", action="store_true",
                   help="files dataset: upload the packed corpus to HBM "
                        "once and feed train steps (K,B) row-index arrays "
                        "instead of pixels — removes the host->device pixel "
                        "stream entirely (data/device_cache.py; implies "
                        "--pack_cache; combine with --steps_per_call). "
                        "Batch stream is identical to the host path")
    p.add_argument("--device_cache_max_gb", type=float, default=8.0,
                   help="HBM budget for --device_cache; corpora over it "
                        "run PARTIALLY resident (overflow pixel rows "
                        "stream per dispatch from the packed shards — "
                        "throughput degrades linearly with the overflow "
                        "fraction, not off a cliff)")
    # model
    p.add_argument("--n_units", type=int, default=256)
    p.add_argument("--time_dense_size", type=int, default=128)
    p.add_argument("--rnn", default="gru", choices=["gru", "lstm"])
    p.add_argument("--rnn_layers", type=int, default=2)
    p.add_argument("--stn", action="store_true")
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument(
        "--dtype", default="auto",
        choices=["auto", "float32", "bfloat16"],
        help="compute dtype (params stay f32). auto = bfloat16 on TPU "
             "backends (measured 3.52 ms/step vs 4.97 f32 at b128, same "
             "converged CER on the bundled tasks — DESIGN.md), float32 "
             "elsewhere; --dtype float32 is the TPU escape hatch",
    )
    # optimization
    p.add_argument("--opt", default="adam",
                   choices=["adam", "sgd", "rmsprop", "adadelta", "adamw"])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine", "cyclic"])
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--steps", type=int, default=5000,
                   help="TOTAL step budget; --resume continues toward it "
                        "replaying the exact remaining batch stream")
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--early_stop_patience", type=int, default=0)
    p.add_argument("--exact_keras_loss", action="store_true")
    p.add_argument(
        "--steps_per_call", type=int, default=1,
        help="K optimizer steps per device dispatch (lax.scan over K "
             "same-bucket batches): amortizes per-dispatch host/tunnel "
             "overhead that otherwise caps end-to-end throughput "
             "(benchmarks/input_gap_profile.json). Device math is identical "
             "to K single steps; with multiple buckets the batch ORDER is "
             "regrouped by bucket (same batches). Logging/eval/checkpoints "
             "land on the first step boundary crossing their cadence")
    # infra
    p.add_argument("--save_path", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_devices", "--G", dest="n_devices", type=int,
                   default=0,
                   help="data-parallel mesh size (0 = all devices); --G is "
                        "the reference's multi-GPU flag name")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --save_path "
                        "(full state: params, optimizer, BN stats, step)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax nan-checking (SURVEY.md §5.2)")
    p.add_argument("--profile_dir",
                   help="capture an xplane trace of ~20 early steps "
                        "(tensorboard --logdir <dir>, profile plugin)")
    p.add_argument("--tensorboard_dir",
                   help="stream scalars to tensorboard (SURVEY.md §5.5)")
    p.add_argument("--on_device_cer", action="store_true",
                   help="eval CER via the batched Levenshtein DP on the "
                        "accelerator (ops/editdistance.py) instead of host "
                        "text edit distance — same value, no per-line "
                        "host decode")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if args.dtype == "auto":
        # bf16 is the TPU training DEFAULT (VERDICT r2 #9): +41% lines/s at
        # b128 (benchmarks/results.json train_step_b128_bf16) with the same
        # converged CER on the bundled tasks (DESIGN.md). CPU keeps f32
        # (bf16 is emulated there). Resolved per process like the other
        # runtime knobs; a resumed checkpoint adopts the resolved value too.
        args.dtype = (
            "bfloat16"
            if jax.default_backend() in ("tpu", "axon")
            else "float32"
        )
        print(f"[crnn_ocr_tpu] dtype: auto -> {args.dtype}", file=sys.stderr)

    from crnn_ocr_tpu.data import (
        Reader,
        ReaderConfig,
        SyntheticConfig,
        SyntheticTextlines,
        device_batches,
        synthetic_batches,
    )
    from crnn_ocr_tpu.models import ModelConfig
    from crnn_ocr_tpu.train import FitConfig, create_train_state, fit, param_count

    if args.stn:
        # The STN localization head flattens a width-dependent feature map
        # (reference C5: Dense after conv/pool), so an STN model is bound
        # to ONE input width. Train it at a single bucket; ModelConfig.width
        # is pinned to it below.
        args.buckets = [max(args.buckets)]
    if args.device_cache and args.dataset != "files":
        print("--device_cache requires --dataset files", file=sys.stderr)
        return 2
    if args.device_cache:
        args.pack_cache = True  # the packed shards ARE the device tables
    if args.dataset in ("synthetic", "fonts"):
        if args.dataset == "fonts":
            from crnn_ocr_tpu.data import FontConfig, FontTextlines

            synth = FontTextlines(FontConfig(
                noise=args.font_noise,
                min_words=args.font_min_words,
                max_words=args.font_max_words,
            ))
            bucket = max(args.buckets)
        else:
            synth = SyntheticTextlines(SyntheticConfig(augment=args.augment))
            bucket = min(128, max(args.buckets))
        codec = synth.codec

        def raw_train(skip=0):
            return synthetic_batches(
                batch_size=args.batch_size, synth=synth, seed=args.seed,
                bucket=bucket, max_label_len=args.max_label_len,
                skip=skip,
            )

        def eval_iter():
            return device_batches(
                synthetic_batches(
                    batch_size=args.batch_size, synth=synth, seed=999,
                    bucket=bucket, max_label_len=args.max_label_len,
                ),
                normalize=args.norm,
            )

    else:
        if not args.path:
            print("--path required for files dataset", file=sys.stderr)
            return 2
        reader = Reader(
            ReaderConfig(
                path=args.path,
                annotation=args.annotation,
                layout=args.layout,
                batch_size=args.batch_size,
                val_fraction=args.val_fraction,
                max_label_len=args.max_label_len,
                buckets=tuple(args.buckets),
                shuffle_seed=args.seed,
                pack_cache=args.pack_cache,
                limit=args.limit or None,
            )
        )
        codec = reader.codec

        def raw_train(skip=0):
            return reader.run_generator(train=True, skip=skip)

        def eval_iter():
            return device_batches(
                reader.run_generator(train=False, epochs=1),
                normalize=args.norm,
            )

    device_corpus = None  # set below (needs the mesh) when --device_cache

    def train_iter(skip=0):
        if device_corpus is not None:
            return device_corpus.stacked_index_batches(
                max(1, args.steps_per_call), skip=skip
            )
        if args.steps_per_call > 1:
            from crnn_ocr_tpu.data.pipeline import stack_host_batches

            return stack_host_batches(
                raw_train(skip), args.steps_per_call, index_offset=skip
            )
        return device_batches(
            raw_train(skip),
            normalize=args.norm,
            augment=args.augment,
            augment_seed=args.seed,
            augment_offset=skip,
        )

    n_dev = args.n_devices or len(jax.devices())
    from crnn_ocr_tpu.models import resolve_runtime_flags

    cfg = resolve_runtime_flags(
        ModelConfig(
            num_classes=codec.num_classes,
            # width = the widest batch this model will see. Conv/RNN params
            # are width-agnostic, but the STN localization Dense is not —
            # params MUST be initialized at the training bucket (C5).
            width=(
                bucket
                if args.dataset in ("synthetic", "fonts")
                else max(args.buckets)
            ),
            n_units=args.n_units,
            time_dense_size=args.time_dense_size,
            rnn_cell=args.rnn,
            rnn_layers=args.rnn_layers,
            use_stn=args.stn,
            dropout_rate=args.dropout,
            dtype=args.dtype,
        ),
        n_shards=n_dev,
    )
    if args.resume:
        import dataclasses as _dc
        import os as _os

        cfg_path = _os.path.join(args.save_path, "model_config.json")
        if _os.path.exists(cfg_path):
            # The checkpoint pins the architecture (incl. migrated
            # reference models, whose shapes the flag defaults won't
            # match); CLI architecture flags only name the FRESH case.
            from crnn_ocr_tpu.train.checkpoint import load_model_config

            saved = load_model_config(args.save_path)
            if saved.num_classes != codec.num_classes:
                print(
                    f"resume: checkpoint has {saved.num_classes} classes "
                    f"but the dataset codec has {codec.num_classes}",
                    file=sys.stderr,
                )
                return 2
            adopted = resolve_runtime_flags(
                _dc.replace(
                    saved, dtype=args.dtype, use_pallas_rnn=None,
                    use_fused_stem=None,
                ),
                n_shards=n_dev,
            )
            if adopted != cfg:
                print(
                    "resume: using architecture from the checkpoint's "
                    "model_config.json (CLI architecture flags ignored)",
                    file=sys.stderr,
                )
            cfg = adopted
    mesh = None
    if n_dev > 1:
        from crnn_ocr_tpu.parallel import make_mesh

        mesh = make_mesh(n_dev)
        print(f"data-parallel mesh: {mesh}", file=sys.stderr)
    if args.device_cache:
        from crnn_ocr_tpu.data.device_cache import DeviceResidentCorpus

        device_corpus = DeviceResidentCorpus(
            reader,
            max_bytes=int(args.device_cache_max_gb * (1 << 30)),
            mesh=mesh,
        )
        mode = (
            f"partial residency {device_corpus.resident_fraction:.0%}"
            if device_corpus.partial else "fully resident"
        )
        print(
            f"[crnn_ocr_tpu] device cache: "
            f"{device_corpus.total_bytes / 1e6:.1f} MB, {mode} in HBM "
            f"({len(reader.samples)} images)",
            file=sys.stderr,
        )
    state = create_train_state(
        cfg, jax.random.key(args.seed), optimizer=args.opt,
        learning_rate=args.lr, batch_size=args.batch_size,
        schedule=args.lr_schedule, total_steps=args.steps,
        warmup_steps=args.warmup_steps, mesh=mesh,
    )
    if args.resume:
        from crnn_ocr_tpu.train import CheckpointManager

        mgr = CheckpointManager(args.save_path)
        step0 = mgr.latest_step()
        if step0 is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape")
                else x,
                state,
            )
            try:
                state = mgr.restore(abstract)
            except ValueError as e:
                print(
                    "resume failed: the checkpoint was written with a "
                    "different optimizer/schedule configuration — pass the "
                    f"same --opt/--lr_schedule/--warmup_steps flags ({e})",
                    file=sys.stderr,
                )
                return 2
            print(f"resumed from step {step0}", file=sys.stderr)
        else:
            print("no checkpoint found; starting fresh", file=sys.stderr)
    print(
        f"devices: {jax.devices()}  params: {param_count(state)/1e6:.2f}M",
        file=sys.stderr,
    )
    fitcfg = FitConfig(
        steps=args.steps,
        eval_every=args.eval_every,
        log_every=args.log_every,
        checkpoint_dir=args.save_path,
        early_stop_patience=args.early_stop_patience,
        metrics_path=f"{args.save_path}/metrics.jsonl",
        seed=args.seed,
        exact_keras_loss=args.exact_keras_loss,
        mesh=mesh,
        tensorboard_dir=args.tensorboard_dir,
        profile_dir=args.profile_dir,
        on_device_cer=args.on_device_cer,
        steps_per_call=args.steps_per_call,
        normalize=args.norm,
        augment=args.augment,
        augment_seed=args.seed,
        device_corpus=device_corpus,
    )
    fit(
        state,
        cfg,
        train_iter(skip=int(state.step)),
        eval_iter_fn=eval_iter,
        codec=codec,
        cfg=fitcfg,
    )
    print(f"saved to {args.save_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
