"""Device-resident corpus (data/device_cache.py): HBM-resident pixels,
index-only batches. Pins (1) batch-stream identity with the --pack_cache
host path, (2) train parity — same losses/params as the streamed pixel
path, (3) the HBM budget guard."""

import os

import jax
import numpy as np
import pytest

from crnn_ocr_tpu.data import Reader, ReaderConfig
from crnn_ocr_tpu.data.device_cache import DeviceResidentCorpus
from crnn_ocr_tpu.data.pipeline import device_batches
from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.train import create_train_state
from crnn_ocr_tpu.train.step import (
    make_cached_multi_train_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines

    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=4)
    )
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("dcache") / "imgs"
    d.mkdir()
    lines = []
    for i in range(24):
        images, texts = synth.sample_batch(1, rng)
        name = f"img_{i}.png"
        cv2.imwrite(str(d / name), images[0])
        lines.append(f"{name}\t{texts[0]}")
    (d / "annotation.txt").write_text("\n".join(lines))
    return str(d)


def _reader(corpus_dir, **kw):
    kw.setdefault("buckets", (64, 128))
    kw.setdefault("batch_size", 4)
    return Reader(ReaderConfig(
        path=corpus_dir, val_fraction=0.0,
        max_label_len=8, pack_cache=True, **kw,
    ))


def test_index_stream_matches_host_batch_stream(corpus_dir):
    """Planning reuses Reader._epoch_batches with the same seeded rng, so
    the (bucket, labels, widths) sequence is identical to the host path —
    and the gathered pixel rows ARE the rows the host path memcpys."""
    r = _reader(corpus_dir)
    corpus = DeviceResidentCorpus(r)
    host = _reader(corpus_dir)  # fresh reader: independent rng state

    idx_iter = corpus.index_batches(train=True, epochs=1)
    host_iter = host.run_generator(train=True, epochs=1)
    n = 0
    for ib, hb in zip(idx_iter, host_iter):
        n += 1
        assert ib["bucket"] == int(hb["bucket"])
        arrs = corpus.arrays(ib["bucket"])
        lab = np.asarray(arrs["labels"])[ib["rows"]]
        ll = np.asarray(arrs["lab_len"])[ib["rows"]]
        np.testing.assert_array_equal(lab, hb["the_labels"])
        np.testing.assert_array_equal(ll, hb["label_length"])
        w = np.asarray(arrs["widths"])[ib["rows"]]
        np.testing.assert_array_equal(w, hb["widths"])  # stored w_new
        px = np.asarray(arrs["pixels"])[ib["rows"]]  # (B, 32, W)
        # host canvas is packed to the batch max width; stored rows are
        # white-padded to the bucket — content must agree exactly
        hw = hb["the_input"].shape[2]
        np.testing.assert_array_equal(px[:, :, :hw], hb["the_input"])
        assert (px[:, :, hw:] == 255).all()
    assert n == 6  # 24 imgs / B=4 (both buckets)


def test_cached_step_matches_streamed_pixel_path(corpus_dir):
    """3 train steps fed from HBM row-index gathers == 3 steps fed streamed
    pixels (same batches, same math): losses and params agree."""
    r = _reader(corpus_dir)
    corpus = DeviceResidentCorpus(r)
    cfg = ModelConfig(
        num_classes=r.codec.num_classes,
        width=128,
        stem_filters=8,
        block_filters=(12, 16, 16, 24),
        time_dense_size=16,
        n_units=16,
        rnn_layers=1,
        dropout_rate=0.1,
    )
    rng = jax.random.key(11)
    K = 3

    # streamed reference (fresh reader: same seeded planner)
    host = _reader(corpus_dir)
    state_a = create_train_state(cfg, jax.random.key(0), batch_size=4)
    single = make_train_step(cfg, donate=False)
    losses_a = []
    hb_iter = device_batches(
        host.run_generator(train=True, epochs=1), prefetch=0
    )
    taken = []
    for db in hb_iter:
        if len(taken) == K:
            break
        taken.append(db)
    # device-cache path consumes the same stream; keep only same-bucket
    # stacks comparable: take the first K batches regardless of bucket and
    # run them one stack each (K=1 scans) so order matches exactly
    cached = make_cached_multi_train_step(cfg, donate=False)
    state_b = create_train_state(cfg, jax.random.key(0), batch_size=4)
    ib_iter = corpus.index_batches(train=True, epochs=1)
    for j, (db, ib) in enumerate(zip(taken, ib_iter)):
        db.pop("texts"), db.pop("bucket")
        state_a, m = single(state_a, db, rng)
        losses_a.append(float(m["loss"]))
        arrs = corpus.arrays(ib["bucket"])
        state_b, ms = cached(
            state_b,
            arrs["pixels"], arrs["widths"], arrs["labels"], arrs["lab_len"],
            ib["rows"][None, :], np.array([j], np.int32), rng,
            bucket=ib["bucket"],
        )
        np.testing.assert_allclose(
            float(ms["loss"][0]), losses_a[-1], rtol=1e-5, atol=1e-6,
            err_msg=f"batch {j}",
        )
    assert int(state_a.step) == K == int(state_b.step)
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        )


def test_stacked_index_batches_shape_and_indices(corpus_dir):
    r = _reader(corpus_dir)
    corpus = DeviceResidentCorpus(r)
    items = list(corpus.stacked_index_batches(2, train=True, epochs=1))
    assert all(it["device_cached"] for it in items)
    ks = [it["stacked"] for it in items]
    assert sum(ks) == 6  # all 6 batches covered, grouped or flushed
    idx = sorted(int(i) for it in items for i in it["batch_index"])
    assert idx == list(range(6))
    for it in items:
        assert it["rows"].shape == (it["stacked"], 4)


def test_hbm_budget_guard(corpus_dir):
    """Budgets below even the label/width tables still refuse; budgets that
    fit the tables but not all pixels now run PARTIALLY resident instead of
    refusing (round 5, VERDICT r4 weak #4)."""
    r = _reader(corpus_dir)
    with pytest.raises(ValueError, match="partial residency"):
        DeviceResidentCorpus(r, max_bytes=100)
    r2 = _reader(corpus_dir)
    c = DeviceResidentCorpus(r2, max_bytes=30_000)  # tables fit, pixels don't
    assert c.partial and 0.0 < c.resident_fraction < 1.0
    for b, n_res in c._n_resident.items():
        assert 1 <= n_res < c._mm[b].shape[0] or c._mm[b].shape[0] == 1
        # resident slice is a prefix of the shard
        assert np.asarray(c.arrays(b)["pixels"]).shape[0] == n_res


def test_partial_residency_stream_and_payload_identity(corpus_dir):
    """Partial-residency stacks carry the SAME rows/batch_index stream as
    full residency; the miss payload holds exactly the overflow rows'
    packed pixels, and pix_rows encodes a consistent resident/miss split."""
    r_full = _reader(corpus_dir)
    full = DeviceResidentCorpus(r_full)
    r_part = _reader(corpus_dir)
    budget = int(
        sum(n * 40 for n in (24,))  # tables: 24 rows * (4*8+8) bytes
        + 0.5 * sum(
            mm.shape[0] * mm.shape[1] * mm.shape[2]
            for mm in full._mm.values()
        )
    )
    part = DeviceResidentCorpus(r_part, max_bytes=budget)
    assert part.partial

    full_stacks = list(full.stacked_index_batches(2, epochs=1))
    part_stacks = list(part.stacked_index_batches(2, epochs=1))
    assert len(full_stacks) == len(part_stacks)
    saw_miss = False
    for f, p in zip(full_stacks, part_stacks):
        assert f["bucket"] == p["bucket"]
        np.testing.assert_array_equal(f["rows"], p["rows"])
        np.testing.assert_array_equal(f["batch_index"], p["batch_index"])
        n_res = part._n_resident[p["bucket"]]
        res_px = np.asarray(part.arrays(p["bucket"])["pixels"])
        full_px = np.asarray(full.arrays(f["bucket"])["pixels"])
        pr = p["pix_rows"]
        for k in range(pr.shape[0]):
            for j in range(pr.shape[1]):
                row = int(p["rows"][k, j])
                if pr[k, j] >= 0:
                    assert row < n_res
                    np.testing.assert_array_equal(
                        res_px[pr[k, j]], full_px[row]
                    )
                else:
                    saw_miss = True
                    assert row >= n_res
                    slot = -int(pr[k, j]) - 1
                    np.testing.assert_array_equal(
                        p["miss_pixels"][slot], full_px[row]
                    )
    assert saw_miss  # the forced budget must actually overflow


def test_partial_residency_train_parity_bitwise(corpus_dir):
    """2 stacked train steps through the partial-residency step (dual
    gather + select) == the full-residency step, params BITWISE equal —
    same bytes, same math, only the transport differs."""
    from crnn_ocr_tpu.train.step import make_partial_cached_multi_train_step

    r_full = _reader(corpus_dir, buckets=(128,))
    full = DeviceResidentCorpus(r_full)
    r_part = _reader(corpus_dir, buckets=(128,))
    budget = int(960 + 0.5 * full._mm[128].nbytes)
    part = DeviceResidentCorpus(r_part, max_bytes=budget)
    assert part.partial

    cfg = ModelConfig(
        num_classes=r_full.codec.num_classes, width=128, stem_filters=8,
        block_filters=(8, 8, 12, 12), time_dense_size=8, n_units=8,
        rnn_layers=1, dropout_rate=0.1,
    )
    rng = jax.random.key(2)
    f_stack = next(iter(full.stacked_index_batches(2, epochs=1)))
    p_stack = next(iter(part.stacked_index_batches(2, epochs=1)))

    arrs_f = full.arrays(128)
    s_f = create_train_state(cfg, jax.random.key(0), batch_size=4)
    step_f = make_cached_multi_train_step(cfg, donate=False)
    s_f, ms_f = step_f(
        s_f, arrs_f["pixels"], arrs_f["widths"], arrs_f["labels"],
        arrs_f["lab_len"], f_stack["rows"], f_stack["batch_index"], rng,
        bucket=128,
    )

    arrs_p = part.arrays(128)
    s_p = create_train_state(cfg, jax.random.key(0), batch_size=4)
    step_p = make_partial_cached_multi_train_step(cfg, donate=False)
    s_p, ms_p = step_p(
        s_p, arrs_p["pixels"], arrs_p["widths"], arrs_p["labels"],
        arrs_p["lab_len"], p_stack["miss_pixels"], p_stack["rows"],
        p_stack["pix_rows"], p_stack["batch_index"], rng, bucket=128,
    )

    np.testing.assert_array_equal(
        np.asarray(ms_p["loss"]), np.asarray(ms_f["loss"])
    )
    for a, b in zip(
        jax.tree.leaves(s_f.params), jax.tree.leaves(s_p.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_requires_pack_cache(corpus_dir):
    r = Reader(ReaderConfig(
        path=corpus_dir, batch_size=4, val_fraction=0.0, buckets=(64, 128),
        pack_cache=False,
    ))
    with pytest.raises(ValueError, match="pack_cache"):
        DeviceResidentCorpus(r)


def test_conflicting_duplicate_transcriptions_rejected(tmp_path):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "dup"
    d.mkdir()
    img = np.random.default_rng(0).integers(0, 255, (32, 40)).astype(np.uint8)
    cv2.imwrite(str(d / "a.png"), img)
    (d / "annotation.txt").write_text("a.png\t12\na.png\t34")
    r = Reader(ReaderConfig(
        path=str(d), batch_size=1, val_fraction=0.0, buckets=(64,),
        pack_cache=True,
    ))
    with pytest.raises(ValueError, match="conflicting"):
        DeviceResidentCorpus(r)


@pytest.mark.slow
def test_device_cache_resume_is_bitwise(corpus_dir, tmp_path):
    """SURVEY §5.4 for the device-cache iterator: fit 4 steps (K=2 stacks)
    -> checkpoint -> restore -> fit to an 8-step TOTAL with the index
    stream skipped to step 4 == a straight 8-step run, params bitwise.
    Single bucket, so the stacked stream replays exactly (multi-bucket
    regrouping state is documented as order-only divergence)."""
    from crnn_ocr_tpu.train import CheckpointManager, FitConfig, fit

    r = _reader(corpus_dir, buckets=(128,))
    corpus = DeviceResidentCorpus(r)
    cfg = ModelConfig(
        num_classes=r.codec.num_classes, width=128, stem_filters=8,
        block_filters=(8, 8, 12, 12), time_dense_size=8, n_units=8,
        rnn_layers=1, dropout_rate=0.0,
    )

    def stream(skip=0):
        return corpus.stacked_index_batches(2, skip=skip)

    def fitcfg(steps, **kw):
        return FitConfig(steps=steps, log_every=100, eval_every=10_000,
                         steps_per_call=2, device_corpus=corpus, **kw)

    def fresh_state():
        return create_train_state(cfg, jax.random.key(0))

    s_a = fit(fresh_state(), cfg, stream(), cfg=fitcfg(8))

    ckdir = str(tmp_path / "ck")
    s_b = fit(fresh_state(), cfg, stream(), cfg=fitcfg(4, checkpoint_dir=ckdir))
    mgr = CheckpointManager(ckdir)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, s_b,
    )
    s_c = mgr.restore(abstract)
    assert int(s_c.step) == 4
    s_c = fit(s_c, cfg, stream(skip=4), cfg=fitcfg(8))

    assert int(s_c.step) == int(s_a.step) == 8
    for pa, pc in zip(
        jax.tree.leaves(s_a.params), jax.tree.leaves(s_c.params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc))


@pytest.mark.slow
def test_partial_residency_resume_is_bitwise(corpus_dir, tmp_path):
    """SURVEY §5.4 for the PARTIAL-residency iterator (round 5): the miss
    payload is a deterministic function of the planned rows, so a
    checkpoint-resume run over a partially-resident corpus must replay
    bitwise, exactly like the full-residency resume test."""
    from crnn_ocr_tpu.train import CheckpointManager, FitConfig, fit

    def mk():
        r = _reader(corpus_dir, buckets=(128,))
        full_pix = 24 * 32 * 128
        c = DeviceResidentCorpus(r, max_bytes=int(960 + 0.5 * full_pix))
        assert c.partial
        return c

    corpus = mk()
    cfg = ModelConfig(
        num_classes=corpus.reader.codec.num_classes, width=128,
        stem_filters=8, block_filters=(8, 8, 12, 12), time_dense_size=8,
        n_units=8, rnn_layers=1, dropout_rate=0.0,
    )

    def stream(skip=0):
        return corpus.stacked_index_batches(2, skip=skip)

    def fitcfg(steps, **kw):
        return FitConfig(steps=steps, log_every=100, eval_every=10_000,
                         steps_per_call=2, device_corpus=corpus, **kw)

    def fresh_state():
        return create_train_state(cfg, jax.random.key(0))

    s_a = fit(fresh_state(), cfg, stream(), cfg=fitcfg(8))

    ckdir = str(tmp_path / "ckp")
    s_b = fit(fresh_state(), cfg, stream(), cfg=fitcfg(4, checkpoint_dir=ckdir))
    mgr = CheckpointManager(ckdir)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, s_b,
    )
    s_c = mgr.restore(abstract)
    assert int(s_c.step) == 4
    s_c = fit(s_c, cfg, stream(skip=4), cfg=fitcfg(8))

    assert int(s_c.step) == int(s_a.step) == 8
    for pa, pc in zip(
        jax.tree.leaves(s_a.params), jax.tree.leaves(s_c.params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc))


@pytest.mark.slow
def test_cached_step_dp_mesh_matches_single_device(corpus_dir):
    """The device-cache scan under an 8-device DP mesh (replicated HBM
    tables, gathered batch explicitly constrained to 'data'-sharding) must
    produce the same losses/params as the mesh-free scan."""
    from crnn_ocr_tpu.parallel import make_mesh
    from crnn_ocr_tpu.parallel import mesh as mesh_lib

    r = _reader(corpus_dir, batch_size=8, buckets=(128,))
    corpus = DeviceResidentCorpus(r)
    cfg = ModelConfig(
        num_classes=r.codec.num_classes, width=128, stem_filters=8,
        block_filters=(12, 16, 16, 24), time_dense_size=16, n_units=16,
        rnn_layers=1, dropout_rate=0.1,
    )
    rng = jax.random.key(3)
    stack = next(iter(corpus.stacked_index_batches(2)))
    arrs = corpus.arrays(128)

    state_ref = create_train_state(cfg, jax.random.key(0), batch_size=8)
    cached_ref = make_cached_multi_train_step(cfg, donate=False)
    state_ref, ms_ref = cached_ref(
        state_ref, arrs["pixels"], arrs["widths"], arrs["labels"],
        arrs["lab_len"], stack["rows"], stack["batch_index"], rng, bucket=128,
    )

    mesh = make_mesh(8)
    corpus_m = DeviceResidentCorpus(r, mesh=mesh)
    arrs_m = corpus_m.arrays(128)
    state_m = mesh_lib.replicate_state(
        create_train_state(cfg, jax.random.key(0), batch_size=8, mesh=mesh),
        mesh,
    )
    cached_m = make_cached_multi_train_step(cfg, donate=False, mesh=mesh)
    state_m, ms_m = cached_m(
        state_m, arrs_m["pixels"], arrs_m["widths"], arrs_m["labels"],
        arrs_m["lab_len"], stack["rows"], stack["batch_index"], rng,
        bucket=128,
    )

    np.testing.assert_allclose(
        np.asarray(ms_m["loss"]), np.asarray(ms_ref["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(
        jax.tree.leaves(state_ref.params), jax.tree.leaves(state_m.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-6
        )
