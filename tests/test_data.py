"""Data layer tests: codec round-trip, reader layouts, bucketing."""

import os

import numpy as np
import pytest

from crnn_ocr_tpu.data import (
    LabelCodec,
    Reader,
    ReaderConfig,
    SyntheticConfig,
    SyntheticTextlines,
)


def test_codec_roundtrip(tmp_path):
    codec = LabelCodec.from_texts(["hello", "world42"])
    labels = codec.text_to_labels("hello")
    assert codec.labels_to_text(labels) == "hello"
    dense, lens = codec.encode_batch(["he", "world"], max_len=8)
    assert dense.shape == (2, 8)
    assert list(lens) == [2, 5]
    p = str(tmp_path / "classes.json")
    codec.save(p)
    again = LabelCodec.load(p)
    assert again.classes == codec.classes
    assert again.blank_index == codec.blank_index


def test_codec_pickle_compat(tmp_path):
    """Reference artifacts persist the class map as a pickle (C3)."""
    import pickle

    p = str(tmp_path / "classes.pkl")
    with open(p, "wb") as f:
        pickle.dump({"a": 0, "b": 1}, f)
    codec = LabelCodec.load(p)
    assert codec.text_to_labels("ab") == [0, 1]


@pytest.fixture
def image_dir(tmp_path):
    cv2 = pytest.importorskip("cv2")
    synth = SyntheticTextlines(SyntheticConfig())
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    lines = []
    for i in range(12):
        images, texts = synth.sample_batch(1, rng)
        name = f"img_{i}.png"
        cv2.imwrite(str(d / name), images[0])
        lines.append(f"{name}\t{texts[0]}")
    (d / "annotation.txt").write_text("\n".join(lines))
    # mjsynth-style names for the filename layout
    d2 = tmp_path / "mj"
    d2.mkdir()
    for i in range(6):
        images, texts = synth.sample_batch(1, rng)
        cv2.imwrite(str(d2 / f"{i}_{texts[0]}_x.png"), images[0])
    return tmp_path


def test_reader_annotation_layout(image_dir):
    cfg = ReaderConfig(
        path=str(image_dir / "imgs"),
        annotation="annotation.txt",
        batch_size=4,
        val_fraction=0.25,
    )
    r = Reader(cfg)
    assert len(r.samples) == 12
    batch = next(r.run_generator(train=True))
    assert batch["the_input"].dtype == np.uint8
    assert batch["the_labels"].shape[0] == 4
    # Readf-compatible keys (input_length is computed device-side in
    # pipeline.py from the content width)
    assert {"the_input", "the_labels", "label_length"} <= set(batch)
    # labels decode back to the texts
    for row, text in zip(batch["the_labels"], batch["texts"]):
        assert r.codec.labels_to_text(row[: len(text)]) == text


def test_reader_filename_layout(image_dir):
    cfg = ReaderConfig(
        path=str(image_dir / "mj"), layout="filename", batch_size=2,
        val_fraction=0.0,
    )
    r = Reader(cfg)
    assert len(r.samples) == 6
    texts = {t for _, t in r.samples}
    assert all(t and "_" not in t for t in texts)


def test_bucket_assignment():
    cfg = SyntheticConfig()
    synth = SyntheticTextlines(cfg)
    r_cfg = ReaderConfig(path="/nonexistent", buckets=(64, 128, 192))

    class Dummy(Reader):
        def __init__(self):
            self.cfg = r_cfg

    d = Dummy()
    img = np.zeros((64, 300), np.uint8)  # w_new = 150 -> bucket 192
    assert d.bucket_of(img) == 192
    img = np.zeros((32, 40), np.uint8)  # w_new = 40 -> bucket 64
    assert d.bucket_of(img) == 64
    img = np.zeros((32, 4000), np.uint8)  # overflow -> largest bucket
    assert d.bucket_of(img) == 192


def test_synthetic_batches_pipeline():
    from crnn_ocr_tpu.data import synthetic_batches, device_batches

    host = synthetic_batches(batch_size=4, bucket=128, steps=2)
    dev = device_batches(host, prefetch=0)
    b = next(dev)
    assert b["x"].shape == (4, 32, 128)
    assert b["input_length"].min() >= 1
    assert int(b["input_length"].max()) <= 128 // 4 - 2


def test_codec_strict_and_lenient():
    codec = LabelCodec.from_alphabet("abc")
    with pytest.raises(KeyError):
        codec.text_to_labels("abz")
    assert codec.text_to_labels("abz", strict=False) == [0, 1]
    dense, lens = codec.encode_batch(["az", "bb"], strict=False)
    assert list(lens) == [1, 2]


def test_pack_canvas_color_and_errors():
    from crnn_ocr_tpu.ops.preprocess import pack_canvas

    rgb = np.zeros((10, 12, 3), np.uint8)
    rgb[..., 1] = 255  # green
    canvas, hs, ws = pack_canvas([rgb])
    assert canvas.shape == (1, 10, 12)
    assert 140 < canvas[0, 0, 0] < 160  # luma of pure green ~150
    with pytest.raises(ValueError):
        pack_canvas([])
    with pytest.raises(ValueError):
        pack_canvas([np.zeros((2, 2, 2, 2), np.uint8)])


def test_device_batches_prefetch_thread():
    """The prefetch>0 path (background thread + queue) yields the same
    batches as prefetch=0 and terminates cleanly."""
    from crnn_ocr_tpu.data import device_batches, synthetic_batches

    a = list(device_batches(
        synthetic_batches(batch_size=4, bucket=64, steps=3, seed=5),
        prefetch=0,
    ))
    b = list(device_batches(
        synthetic_batches(batch_size=4, bucket=64, steps=3, seed=5),
        prefetch=2,
    ))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x["x"]), np.asarray(y["x"]), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(x["the_labels"]), np.asarray(y["the_labels"])
        )


def test_reader_epoch_bound_and_steps(image_dir):
    cfg = ReaderConfig(
        path=str(image_dir / "imgs"),
        annotation="annotation.txt",
        batch_size=4,
        val_fraction=0.25,
    )
    r = Reader(cfg)
    n_train = r.steps_per_epoch(train=True)
    batches = list(r.run_generator(train=True, epochs=2))
    assert len(batches) == 2 * n_train
    # validation generator covers the val split once, ragged tail kept
    val_batches = list(r.run_generator(train=False, epochs=1))
    n_val_samples = sum(len(b["texts"]) for b in val_batches)
    assert n_val_samples == 3  # 12 * 0.25


def test_size_cache_sidecar_zero_decodes_on_resume(image_dir):
    """VERDICT r2 #7: bucket planning decodes each image ONCE ever; a
    second Reader over the same dir (a --resume process) must plan and
    skip-fast-forward with ZERO image decodes, via .crnn_sizes.json."""

    class CountingReader(Reader):
        def __init__(self, *a, **kw):
            self.decodes = 0
            super().__init__(*a, **kw)

        def _load_image(self, path):
            self.decodes += 1
            return super()._load_image(path)

    cfg = ReaderConfig(
        path=str(image_dir / "imgs"),
        annotation="annotation.txt",
        batch_size=2,
        val_fraction=0.0,
    )
    r1 = CountingReader(cfg)
    gen = r1.run_generator(train=True, epochs=2)
    b0 = next(gen)
    # cold corpus: planning decoded everything once, batch decode re-reads
    n = len(r1.samples)
    assert r1.decodes == n + cfg.batch_size
    # second epoch's planning must not re-decode (in-memory + sidecar)
    for _ in gen:
        pass
    assert r1.decodes <= n + n * 2  # only batch decodes after planning
    import os

    assert os.path.exists(os.path.join(cfg.path, ".crnn_sizes.json"))

    # fresh process (resume): sidecar makes planning + skip decode-free
    r2 = CountingReader(cfg)
    gen2 = r2.run_generator(train=True, epochs=1, skip=2)
    batch = next(gen2)
    assert r2.decodes == cfg.batch_size  # ONLY the yielded batch's images
    assert batch["the_input"].shape[0] == cfg.batch_size


def test_packed_cache_zero_decodes_and_stream_identity(image_dir):
    """VERDICT r3 #1 mitigation (data/packed.py): with pack_cache=True the
    first pass decodes each image ONCE into mmap shards; every later epoch
    and every fresh process feeds decode-FREE. The batch stream (sample
    order, buckets, labels, input lengths) is identical to the uncached
    reader; pixels agree up to the cv2-vs-XLA resample bound."""

    class CountingReader(Reader):
        def __init__(self, *a, **kw):
            self.decodes = 0
            super().__init__(*a, **kw)

        def _decode_image(self, path):
            self.decodes += 1
            return super()._decode_image(path)

    base = dict(
        path=str(image_dir / "imgs"),
        annotation="annotation.txt",
        batch_size=2,
        val_fraction=0.0,
    )
    r_plain = CountingReader(ReaderConfig(**base))
    r_pack = CountingReader(ReaderConfig(**base, pack_cache=True))
    n = len(r_pack.samples)

    plain_batches = list(r_plain.run_generator(train=True, epochs=1))
    pack_batches = list(r_pack.run_generator(train=True, epochs=1))
    # cold corpus: planning decoded+packed everything once; batch assembly
    # then reads mmap rows only
    assert r_pack.decodes == n
    assert len(pack_batches) == len(plain_batches)

    from crnn_ocr_tpu.data import device_batches

    for bp, bu in zip(pack_batches, plain_batches):
        assert bp["texts"] == bu["texts"]  # identical stream order
        assert bp["bucket"] == bu["bucket"]
        np.testing.assert_array_equal(bp["the_labels"], bu["the_labels"])
        np.testing.assert_array_equal(bp["label_length"], bu["label_length"])
    dp = next(device_batches(iter(pack_batches[:1]), prefetch=0))
    du = next(device_batches(iter(plain_batches[:1]), prefetch=0))
    np.testing.assert_array_equal(
        np.asarray(dp["input_length"]), np.asarray(du["input_length"])
    )
    # pixel proximity after the full device preprocess (normalized units):
    # the cached row was resized by cv2 on host, the uncached one by the
    # XLA resampler — test_preprocess.py pins that parity per-op
    dmax = float(np.max(np.abs(np.asarray(dp["x"]) - np.asarray(du["x"]))))
    assert dmax < 0.08, f"cached pixels diverge from direct path: {dmax}"

    # epoch 2 and a fresh process: ZERO decodes
    r_pack.decodes = 0
    for _ in r_pack.run_generator(train=True, epochs=1):
        pass
    assert r_pack.decodes == 0
    r_fresh = CountingReader(ReaderConfig(**base, pack_cache=True))
    for _ in r_fresh.run_generator(train=True, epochs=1, skip=1):
        pass
    assert r_fresh.decodes == 0


def test_packed_cache_interrupted_build_recovers(image_dir, tmp_path):
    """Rows appended after the last index flush (an interrupted first
    epoch) are truncated on reload, so re-adds land at the row the index
    assigns — no misaligned reads, no full rebuild."""
    import cv2

    from crnn_ocr_tpu.data.packed import PackedCache

    d = str(tmp_path / "corpus")
    os.makedirs(d)
    rng = np.random.default_rng(3)
    imgs = {
        f"im{i}.png": rng.integers(0, 255, (24, 40 + 5 * i)).astype(np.uint8)
        for i in range(5)
    }
    pc = PackedCache(d, height=32, buckets=(64, 128))
    for name in ("im0.png", "im1.png", "im2.png"):
        pc.add(name, imgs[name])
    pc.flush_index()
    pc.add("im3.png", imgs["im3.png"])  # appended but never indexed
    # "crash": reload from disk
    pc2 = PackedCache(d, height=32, buckets=(64, 128))
    assert len(pc2) == 3 and "im3.png" not in pc2
    b, r, w = pc2.add("im3.png", imgs["im3.png"])
    pc2.flush_index()
    expect = cv2.resize(
        imgs["im3.png"], (w, 32), interpolation=cv2.INTER_LINEAR
    )
    np.testing.assert_array_equal(np.asarray(pc2.get("im3.png")), expect)
    # earlier rows still read back exactly
    for name in ("im0.png", "im1.png", "im2.png"):
        got = np.asarray(pc2.get(name))
        h0, w0 = imgs[name].shape
        wn = min(int(round(w0 * 32 / h0)), pc2.entries[name][0])
        np.testing.assert_array_equal(
            got,
            cv2.resize(imgs[name], (wn, 32),
                       interpolation=cv2.INTER_LINEAR),
        )


def test_fontgen_degradations_deterministic_and_bounded():
    """FontConfig degradation knobs (blur / contrast_min / downscale_min):
    renders stay uint8 in-range, are deterministic given the rng state,
    and low contrast measurably shrinks the ink-paper span."""
    from crnn_ocr_tpu.data import FontConfig, FontTextlines

    hard = FontTextlines(FontConfig(
        noise=0.05, blur=1.0, contrast_min=0.4, downscale_min=0.6,
    ))
    a = hard.render("hello", np.random.default_rng(3))
    b = hard.render("hello", np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8

    clean = FontTextlines(FontConfig(noise=0.0))
    dark = FontTextlines(FontConfig(noise=0.0, contrast_min=0.3))
    spans_c, spans_d = [], []
    for s in range(8):
        rng = np.random.default_rng(s)
        img_c = clean.render("contrast", rng)
        rng = np.random.default_rng(s)
        img_d = dark.render("contrast", rng)
        spans_c.append(int(img_c.max()) - int(img_c.min()))
        spans_d.append(int(img_d.max()) - int(img_d.min()))
    assert np.mean(spans_d) < np.mean(spans_c)


def test_fontgen_render_time_warp():
    """warp_shear / warp_rotate / warp_perspective (the STN A/B corpus
    knobs): deterministic given the rng state, ink preserved (exact-bbox
    canvas, no clipping), geometry measurably changed vs the plain render,
    and zero knobs leave the plain path bit-identical."""
    from crnn_ocr_tpu.data import FontConfig, FontTextlines

    plain = FontTextlines(FontConfig(noise=0.0))
    warp = FontTextlines(FontConfig(
        noise=0.0, warp_shear=0.5, warp_rotate=2.0, warp_perspective=0.12,
    ))
    a = warp.render("Warped", np.random.default_rng(5))
    b = warp.render("Warped", np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8

    changed = 0
    for s in range(8):
        p = plain.render("geometry", np.random.default_rng(s))
        w = warp.render("geometry", np.random.default_rng(s))
        # ink is preserved within resampling blur (no corner clipping)
        assert (w < 128).sum() > 0.5 * (p < 128).sum()
        if w.shape != p.shape or not np.array_equal(w, p):
            changed += 1
    assert changed == 8  # strong knobs must actually distort

    # zero knobs -> the added code path is inert
    off = FontTextlines(FontConfig(noise=0.0))
    for s in range(3):
        np.testing.assert_array_equal(
            plain.render("inert", np.random.default_rng(s)),
            off.render("inert", np.random.default_rng(s)),
        )
