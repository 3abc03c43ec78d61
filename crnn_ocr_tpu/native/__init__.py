"""ctypes bindings for the native host components (C++, see src/).

The reference's host-side performance code lives in C++ libraries
(editdistance, TF's CTC beam kernel, OpenCV imgproc — SURVEY.md §2.2); this
package is the framework's own native layer. Auto-builds with `make` (g++)
on first import; every entry point has a pure-Python fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libcrnnocr.so")
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-s"],
                cwd=_DIR,
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.levenshtein_i32.restype = ctypes.c_int64
    lib.levenshtein_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.ctc_beam_decode_tf.restype = None
    lib.ctc_beam_decode_tf.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.preprocess_line_u8.restype = ctypes.c_int32
    lib.preprocess_line_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_i32(seq: Sequence) -> np.ndarray:
    if isinstance(seq, str):
        return np.frombuffer(seq.encode("utf-32-le"), dtype=np.int32).copy()
    arr = np.asarray(list(seq))
    if arr.dtype.kind == "U" or arr.dtype == object:
        # sequence of tokens -> hash to ids (stable within one call pair)
        raise TypeError("token sequences need pre-encoding to ints")
    return np.ascontiguousarray(arr, dtype=np.int32)


def editdistance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance via the C++ kernel. Accepts strings or int
    sequences; raises if the native lib is unavailable (callers fall back —
    see crnn_ocr_tpu.utils.metrics.levenshtein)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    try:
        aa, bb = _as_i32(a), _as_i32(b)
    except TypeError:
        # token lists (e.g. WER words): map tokens to ids
        vocab = {}
        enc = lambda s: np.asarray(
            [vocab.setdefault(t, len(vocab)) for t in s], np.int32
        )
        aa, bb = enc(a), enc(b)
    return int(
        lib.levenshtein_i32(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(aa),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(bb),
        )
    )


def ctc_beam_decode_tf(
    probs: np.ndarray,
    seq_len: np.ndarray,
    beam_width: int = 10,
    top_paths: int = 1,
    merge_repeated: bool = True,
):
    """TF-exact beam decode via the C++ kernel.

    Returns (paths (B, top_paths, T) int32 -1-padded, lens (B, top_paths),
    scores (B, top_paths) float32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    B, T, C = probs.shape
    seq_len = np.ascontiguousarray(seq_len, dtype=np.int32).reshape(B)
    out_paths = np.full((B, top_paths, T), -1, np.int32)
    out_lens = np.zeros((B, top_paths), np.int32)
    out_scores = np.zeros((B, top_paths), np.float32)
    lib.ctc_beam_decode_tf(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B,
        T,
        C,
        seq_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        beam_width,
        top_paths,
        1 if merge_repeated else 0,
        out_paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out_paths, out_lens, out_scores


def preprocess_line(
    img: np.ndarray, out_h: int = 32, out_w: int = 128, normalize: bool = True
):
    """Host preprocessing via the C++ kernel: (h, w) uint8 -> ((out_h, out_w)
    float32, content_width)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    dst = np.empty((out_h, out_w), np.float32)
    w_new = lib.preprocess_line_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h,
        out_w,
        1 if normalize else 0,
    )
    return dst, int(w_new)
