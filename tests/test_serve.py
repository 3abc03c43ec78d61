"""Serving runtime tests: dynamic batcher coalescing + HTTP round-trip.

Covers the serving-side scheduler the reference lacks (its predict path is
one script invocation per run, SURVEY.md C11): request coalescing,
bucket routing, ladder padding, error propagation, and the HTTP daemon."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from crnn_ocr_tpu.data import SyntheticConfig, SyntheticTextlines
from crnn_ocr_tpu.infer import Predictor
from crnn_ocr_tpu.models import ModelConfig
from crnn_ocr_tpu.serve import (
    DynamicBatcher,
    OCRServer,
    batch_ladder,
    decode_image_bytes,
)
from crnn_ocr_tpu.train import create_train_state


@pytest.fixture(scope="module")
def predictor():
    synth = SyntheticTextlines(
        SyntheticConfig(alphabet="0123456789", min_len=2, max_len=5)
    )
    cfg = ModelConfig(
        num_classes=synth.codec.num_classes,
        width=128,
        stem_filters=8,
        block_filters=(8, 8, 8, 8),
        time_dense_size=8,
        n_units=8,
        rnn_layers=1,
    )
    state = create_train_state(cfg, jax.random.key(0))
    return (
        Predictor(cfg, state.params, state.batch_stats, synth.codec),
        synth,
    )


def test_batch_ladder():
    assert batch_ladder(1) == (1,)
    assert batch_ladder(8) == (1, 2, 4, 8)
    assert batch_ladder(48) == (1, 2, 4, 8, 16, 32, 48)


def test_batcher_single_and_concurrent(predictor):
    pred, synth = predictor
    rng = np.random.default_rng(0)
    images, _ = synth.sample_batch(6, rng)
    b = DynamicBatcher(pred, max_batch=8, max_wait_ms=20.0).start()
    try:
        # single sync request

        out = b.predict_sync(images[0], timeout=120)
        assert isinstance(out.text, str) and np.isfinite(out.score)
        # concurrent burst coalesces into fewer device batches
        futs = [b.submit(im) for im in images]
        res = [f.result(timeout=120) for f in futs]
        assert len(res) == 6
        assert all(isinstance(r.text, str) for r in res)
        snap = b.stats.snapshot()
        assert snap["requests"] == 7
        # the 6-burst must land in at most 6 batches and at least one batch
        # must have held >1 request (coalescing actually happened)
        assert snap["batches"] <= 7
    finally:
        b.stop()


def test_batcher_results_match_direct_predict(predictor):
    """Batched-through-the-queue output == direct Predictor.predict."""
    pred, synth = predictor
    rng = np.random.default_rng(1)
    images, _ = synth.sample_batch(4, rng)
    direct = pred.predict(list(images), greedy=True)
    b = DynamicBatcher(pred, max_batch=4, max_wait_ms=50.0).start()
    try:
        futs = [b.submit(im) for im in images]
        queued = [f.result(timeout=120) for f in futs]
    finally:
        b.stop()
    for d, q in zip(direct, queued):
        assert d.text == q.text


def test_batcher_mixed_buckets_routed(predictor):
    pred, _ = predictor
    b = DynamicBatcher(pred, max_batch=8, max_wait_ms=30.0).start()
    try:
        narrow = np.full((32, 40), 255, np.uint8)
        wide = np.full((32, 400), 255, np.uint8)
        futs = [b.submit(narrow), b.submit(wide), b.submit(narrow)]
        res = [f.result(timeout=120) for f in futs]
        assert all(isinstance(r.text, str) for r in res)
        # two buckets -> at least 2 device batches for this burst
        assert b.stats.batches >= 2
    finally:
        b.stop()


def test_batcher_error_propagates(predictor):
    pred, _ = predictor
    b = DynamicBatcher(pred, max_batch=2, max_wait_ms=5.0).start()
    try:
        with pytest.raises(ValueError):
            b.submit(np.zeros((4, 4, 3), np.uint8))  # not grayscale
    finally:
        b.stop()
    with pytest.raises(RuntimeError):
        b.submit(np.full((32, 40), 255, np.uint8))  # stopped


def test_decode_image_bytes_npy_and_png(predictor):
    img = (np.arange(32 * 40, dtype=np.uint8).reshape(32, 40)) % 251
    buf = io.BytesIO()
    np.save(buf, img)
    out = decode_image_bytes(buf.getvalue())
    np.testing.assert_array_equal(out, img)
    import cv2

    ok, enc = cv2.imencode(".png", img)
    assert ok
    out2 = decode_image_bytes(enc.tobytes())
    np.testing.assert_array_equal(out2, img)
    with pytest.raises(ValueError):
        decode_image_bytes(b"not an image at all")


def _post(url: str, data: bytes):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_http_server_round_trip(predictor):
    pred, synth = predictor
    rng = np.random.default_rng(2)
    images, _ = synth.sample_batch(3, rng)
    srv = OCRServer(
        pred, host="127.0.0.1", port=0, max_batch=4, max_wait_ms=20.0
    ).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read()) == {"ok": True}

        # concurrent posts (npy payloads) -> coalesced on-device
        results = {}

        def call(i):
            buf = io.BytesIO()
            np.save(buf, images[i])
            results[i] = _post(base + "/predict", buf.getvalue())

        threads = [
            threading.Thread(target=call, args=(i,)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for i in range(3):
            status, body = results[i]
            assert status == 200
            assert isinstance(body["text"], str)
            assert "score" in body

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            snap = json.loads(r.read())
        assert snap["requests"] >= 3
        assert snap["latency_ms_p50"] is not None

        # bad payload -> 400
        try:
            _post(base + "/predict", b"garbage")
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
        assert raised
    finally:
        srv.stop()


def test_serve_cli_parser_defaults():
    from crnn_ocr_tpu.cli.serve import build_parser

    args = build_parser().parse_args(["--model", "/tmp/x", "--port", "0"])
    assert args.max_batch == 32 and args.beam_width == 0
    assert args.warmup and args.norm


def test_batcher_stats_window_bounded():
    from crnn_ocr_tpu.serve import BatcherStats

    s = BatcherStats()
    s._max_kept = 16
    for i in range(100):
        s.record_batch(2, [1.0, 2.0])
    assert len(s.latencies_ms) <= 32
    assert len(s.batch_sizes) <= 32
    snap = s.snapshot()
    assert snap["latency_ms_p50"] == 1.5


def test_batcher_concurrent_stress_and_drain(predictor):
    """Many threads submitting under random jitter; stop(drain=True) must
    serve every queued request exactly once (no drops, no double-sets)."""
    import time

    pred, synth = predictor
    rng = np.random.default_rng(7)
    images, _ = synth.sample_batch(4, rng)
    b = DynamicBatcher(pred, max_batch=4, max_wait_ms=2.0).start()
    futs = []
    lock = threading.Lock()

    def submitter(seed):
        r = np.random.default_rng(seed)
        for _ in range(5):
            time.sleep(float(r.uniform(0, 0.01)))
            f = b.submit(images[int(r.integers(0, 4))])
            with lock:
                futs.append(f)

    threads = [threading.Thread(target=submitter, args=(s,)) for s in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    b.stop(drain=True)  # must flush everything still queued
    texts = [f.result(timeout=120).text for f in futs]
    assert len(texts) == 30
    assert all(isinstance(t, str) for t in texts)
    assert b.stats.requests == 30


def test_http_payload_cap(predictor):
    pred, _ = predictor
    srv = OCRServer(
        pred, host="127.0.0.1", port=0, max_batch=2, max_wait_ms=5.0
    ).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/predict"
        req = urllib.request.Request(
            url, data=b"x", method="POST",
            headers={"Content-Length": str(64 << 20)},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        srv.stop()


def test_http_metrics_endpoint(predictor):
    pred, synth = predictor
    srv = OCRServer(
        pred, host="127.0.0.1", port=0, max_batch=2, max_wait_ms=5.0
    ).start()
    try:
        rng = np.random.default_rng(3)
        images, _ = synth.sample_batch(1, rng)
        buf = io.BytesIO()
        np.save(buf, images[0])
        _post(f"http://127.0.0.1:{srv.port}/predict", buf.getvalue())
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=30
        ) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            body = r.read().decode()
        assert "ocr_requests_total 1" in body
        assert "ocr_latency_ms_p50" in body
    finally:
        srv.stop()


def test_http_alignments_mode(predictor):
    """Daemon started with alignments decode_kw returns per-char spans
    whose chars join to the decoded text; batch padding must not leak
    blank-row spans into real responses."""
    pred, synth = predictor
    rng = np.random.default_rng(9)
    images, _ = synth.sample_batch(2, rng)
    srv = OCRServer(
        pred, host="127.0.0.1", port=0, max_batch=4, max_wait_ms=10.0,
        decode_kw={"greedy": True, "alignments": True},
    ).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        for img in images:
            buf = io.BytesIO()
            np.save(buf, img)
            status, body = _post(base + "/predict", buf.getvalue())
            assert status == 200
            assert "alignments" in body
            spans = body["alignments"]
            assert "".join(s["char"] for s in spans) == body["text"]
            for s in spans:
                assert 0 <= s["x0"] < s["x1"] <= img.shape[1]
                assert 0.0 < s["conf"] <= 1.0
    finally:
        srv.stop()


def test_http_beam_alignments_mode(predictor):
    """Beam daemon with alignments: spans force-align the decoded top path,
    so the joined chars equal the BEAM text returned to the caller."""
    pred, synth = predictor
    rng = np.random.default_rng(17)
    images, _ = synth.sample_batch(2, rng)
    srv = OCRServer(
        pred, host="127.0.0.1", port=0, max_batch=4, max_wait_ms=10.0,
        decode_kw={
            "greedy": False, "beam_width": 4, "top_paths": 1,
            "merge_repeated": True, "alignments": True,
        },
    ).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        for img in images:
            buf = io.BytesIO()
            np.save(buf, img)
            status, body = _post(base + "/predict", buf.getvalue())
            assert status == 200
            assert "alignments" in body
            spans = body["alignments"]
            assert "".join(s["char"] for s in spans) == body["text"]
            prev = 0
            for s in spans:
                assert 0 <= s["x0"] < s["x1"] <= img.shape[1]
                assert s["x0"] >= prev
                prev = s["x1"]
    finally:
        srv.stop()
