"""Minimal client for the OCR serving daemon (cli/serve.py).

Start the daemon:
    python -m crnn_ocr_tpu.cli.serve --pretrained fonts-small --port 8000

Then read images with this script:
    python examples/serve_client.py word1.png word2.png ...

Sends each image concurrently — the daemon coalesces simultaneous requests
into one device batch (watch /stats: mean_batch_size > 1)."""

from __future__ import annotations

import json
import sys
import threading
import urllib.request

HOST = "http://127.0.0.1:8000"


def read_one(path: str, out: dict) -> None:
    with open(path, "rb") as f:
        data = f.read()
    req = urllib.request.Request(
        HOST + "/predict", data=data, method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out[path] = json.loads(r.read())


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 2
    results: dict = {}
    threads = [
        threading.Thread(target=read_one, args=(p, results)) for p in paths
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for p in paths:
        r = results.get(p, {"text": "<error>", "score": float("nan")})
        print(f"{p}\t{r['text']}\t{r['score']:.4f}")
    with urllib.request.urlopen(HOST + "/stats", timeout=30) as r:
        print("stats:", r.read().decode())
    return 0


if __name__ == "__main__":
    sys.exit(main())
