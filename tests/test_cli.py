"""End-to-end CLI surface tests: the files-dataset path through
cli.train -> saved artifacts -> cli.predict (the complete user workflow
the reference's README documents)."""

import os

import numpy as np
import pytest

from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=4)
    )
    rng = np.random.default_rng(0)
    lines = []
    for i in range(24):
        imgs, texts = synth.sample_batch(1, rng)
        name = f"l{i}.png"
        cv2.imwrite(str(d / name), imgs[0])
        lines.append(f"{name}\t{texts[0]}")
    (d / "annotation.txt").write_text("\n".join(lines))
    return str(d)


@pytest.mark.slow
def test_train_then_predict_cli(dataset_dir, tmp_path, capsys):
    from crnn_ocr_tpu.cli.predict import main as predict_main
    from crnn_ocr_tpu.cli.train import main as train_main

    model_dir = str(tmp_path / "model")
    rc = train_main(
        [
            "--path", dataset_dir,
            "--annotation", "annotation.txt",
            "--steps", "8",
            "--eval_every", "8",
            "--batch_size", "8",
            "--n_units", "16",
            "--time_dense_size", "16",
            "--rnn_layers", "1",
            "--val_fraction", "0.25",
            "--save_path", model_dir,
            "--lr_schedule", "cosine",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(model_dir, "model_config.json"))
    assert os.path.exists(os.path.join(model_dir, "classes.json"))
    assert os.path.exists(os.path.join(model_dir, "metrics.jsonl"))

    out_file = str(tmp_path / "preds.tsv")
    rc = predict_main(
        [
            "--model", model_dir,
            "--image_dir", dataset_dir,
            "--annotation", "annotation.txt",
            "--result", out_file,
            "--validate",
            "--beam_width", "4",
            "--top_paths", "2",
        ]
    )
    assert rc == 0
    rows = [l.split("\t") for l in open(out_file).read().splitlines()]
    assert len(rows) == 24
    # row: file, top1, score, top2, score2
    assert all(len(r) >= 5 for r in rows)

    # resume path: continue toward a 12-step TOTAL budget (8 done already)
    rc = train_main(
        [
            "--path", dataset_dir,
            "--annotation", "annotation.txt",
            "--steps", "12",
            "--eval_every", "100",
            "--batch_size", "8",
            # NO architecture flags: --resume must adopt n_units=16 etc.
            # from the checkpoint's model_config.json (defaults would
            # otherwise build a 256-unit model and fail the restore)
            "--val_fraction", "0.25",
            "--save_path", model_dir,
            "--lr_schedule", "cosine",  # resume needs matching optimizer cfg
            "--resume",
        ]
    )
    assert rc == 0


@pytest.mark.slow
def test_train_cli_stn_pins_width(tmp_path):
    """--stn trains at a single bucket and pins ModelConfig.width to it
    (the STN loc-Dense is width-bound, C5); the saved model must load into
    a predictor that serves at that native bucket."""
    import json

    from crnn_ocr_tpu.cli.train import main as train_main
    from crnn_ocr_tpu.infer import init_predictor

    model_dir = str(tmp_path / "stn_model")
    rc = train_main(
        [
            "--dataset", "synthetic",
            "--stn",
            "--buckets", "64",
            "--steps", "2",
            "--eval_every", "2",
            "--batch_size", "4",
            "--n_units", "8",
            "--time_dense_size", "8",
            "--rnn_layers", "1",
            "--save_path", model_dir,
        ]
    )
    assert rc == 0
    cfg = json.load(open(os.path.join(model_dir, "model_config.json")))
    assert cfg["use_stn"] and cfg["width"] == 64
    pred = init_predictor(model_dir)
    assert pred.buckets == (64,)
    # narrow AND wide requests both route to the native bucket
    for w in (30, 300):
        probs, _ = pred.predict_probs(
            [np.full((32, w), 255, np.uint8)]
        )
        assert probs.shape[1] == 64 // 4 - 2


def test_predict_cli_alignments(tmp_path, dataset_dir):
    """--alignments appends a char@x0:x1(conf) column whose chars join to
    the decoded text (fast: artifact saved directly, no training)."""
    import re

    import jax

    from crnn_ocr_tpu.cli.predict import main as predict_main
    from crnn_ocr_tpu.models import ModelConfig
    from crnn_ocr_tpu.train import CheckpointManager, create_train_state

    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=4)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=128,
        stem_filters=8,
        block_filters=(16, 16, 24, 24),
        time_dense_size=16,
        n_units=16,
        rnn_layers=1,
    )
    state = create_train_state(cfg, jax.random.key(0))
    model_dir = str(tmp_path / "m")
    mgr = CheckpointManager(model_dir)
    mgr.save(0, state, cfg, synth.codec)
    mgr.wait()

    out_file = str(tmp_path / "o.tsv")
    rc = predict_main([
        "--model", model_dir,
        "--image_dir", dataset_dir,
        "--greedy",
        "--alignments",
        "--result", out_file,
    ])
    assert rc == 0
    rows = [l.split("\t") for l in open(out_file).read().splitlines()]
    assert len(rows) == 24
    for cols in rows:
        spans = re.findall(r"(.)@(\d+):(\d+)\(", cols[-1])
        assert "".join(c for c, _, _ in spans) == cols[1]
        for _, x0, x1 in spans:
            assert int(x0) < int(x1)
