"""Inference API mirroring the reference's predict path (SURVEY.md C8/C11).

Reference shape: ``init_predictor(path) -> model`` then per image
preprocess -> ``model.predict`` -> ``decode_predict_ctc(out, top_paths,
beam_width)`` -> text. Here the same names exist with the same roles, but
the whole batch path (preprocess -> forward -> softmax -> decode) is one
jitted on-device program per bucket width; the host only decodes image
bytes and maps label ids back to text.

``decode`` modes:
  * greedy (default): on-device argmax decode, confidence =
    exp(-neg_sum_logits) analog kept as raw score (reference prints scores).
  * beam: on-device TF-exact beam search (ops/ctc_beam_device — replicates
    TF's sequential-eviction semantics bit-for-bit on the oracle fuzz
    distributions), or ``exact_tf=True`` for the host-side C++/python
    decoder (same semantics, useful off-device or for cross-checking).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crnn_ocr_tpu.data.codec import LabelCodec
from crnn_ocr_tpu.models import CRNN, ModelConfig
from crnn_ocr_tpu.ops import ctc
from crnn_ocr_tpu.ops.preprocess import pack_canvas, preprocess_batch


@dataclasses.dataclass
class Prediction:
    text: str
    score: float
    candidates: Optional[List[Tuple[str, float]]] = None
    latency_ms: Optional[float] = None
    spans: Optional[list] = None  # List[CharSpan] when alignments=True


@dataclasses.dataclass
class CharSpan:
    """One decoded character localized in the ORIGINAL image (beyond the
    reference, which returns text only): nominal horizontal extent of the
    character's greedy argmax run, mapped back through the resize and the
    conv downsample, plus the peak softmax probability inside the run."""

    char: str
    x0: int  # inclusive, original-image pixel column
    x1: int  # exclusive
    conf: float


class Predictor:
    def __init__(
        self,
        model_cfg: ModelConfig,
        params,
        batch_stats,
        codec: LabelCodec,
        normalize: bool = True,
        buckets: Sequence[int] = (64, 128, 192, 256),
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` for data-parallel
        serving — params replicate, request batches shard over the 'data'
        axis, and the whole predict program runs SPMD (XLA collectives
        over ICI). Batches are padded up to a mesh multiple transparently."""
        self.cfg = model_cfg
        self.codec = codec
        self.normalize = normalize
        self.mesh = mesh
        # An STN model's localization Dense is bound to the width it was
        # trained at (reference C5: flatten -> Dense); other widths would
        # fail at apply time. Serve it at its native bucket only.
        self.buckets = (
            (model_cfg.width,) if model_cfg.use_stn else tuple(buckets)
        )
        self._model = CRNN(cfg=model_cfg, mesh=mesh)
        self._vars = {"params": params, "batch_stats": batch_stats}
        if mesh is not None:
            from crnn_ocr_tpu.parallel import mesh as mesh_lib

            self._vars = mesh_lib.replicate_state(self._vars, mesh)
        self._fwd = jax.jit(
            lambda v, x: jax.nn.softmax(
                self._model.apply(v, x[..., None], train=False)[
                    :, model_cfg.ctc_time_slice :, :
                ],
                axis=-1,
            )
        )

    # ---- core batched path ----

    def bucket_for(self, image: np.ndarray) -> int:
        """Width bucket this image routes to (single source of truth for
        the predictor, predict_many, and the serving batcher)."""
        ih, iw = np.asarray(image).shape[:2]
        if ih <= 0 or iw <= 0:
            raise ValueError(f"empty image: shape {np.asarray(image).shape}")
        w_need = int(round(iw * self.cfg.height / ih))
        return next(
            (b for b in self.buckets if w_need <= b), self.buckets[-1]
        )

    def resolve_bucket(
        self, images: Sequence[np.ndarray], bucket: Optional[int] = None
    ) -> int:
        """Bucket a whole batch routes to: the smallest bucket fitting the
        widest height-normalized image, else the last bucket (images wider
        than it squeeze — preprocess_batch clamps w_new to the bucket)."""
        if bucket is not None:
            return bucket
        w_need = max(
            int(round(im.shape[1] * self.cfg.height / im.shape[0]))
            for im in (np.asarray(im) for im in images)
        )
        return next((b for b in self.buckets if w_need <= b), self.buckets[-1])

    def blank_row(self) -> np.ndarray:
        """White pad image used for batch-ladder padding rows."""
        return np.full((self.cfg.height, 16), 255, np.uint8)

    def warmup(self, batch_size: int = 32, buckets=None) -> None:
        """Pre-compile the forward graph for each width bucket so first-user
        latency is compile-free (compiles are minutes on some hosts)."""
        import numpy as np

        for b in buckets or self.buckets:
            dummy = [
                np.full((self.cfg.height, b), 255, np.uint8)
            ] * batch_size
            self.predict_probs(dummy, bucket=b)

    def predict_probs(
        self, images: Sequence[np.ndarray], bucket: Optional[int] = None
    ):
        """images: list of grayscale uint8 arrays -> (probs, input_length).

        The raw canvas dims are snapped up a static shape ladder
        (``preprocess.quantize_dim``) — a serving predictor sees arbitrary
        image sizes, and every distinct canvas shape is a jit cache key.
        On a mesh, the batch pads up to a device multiple (blank rows,
        dropped from the outputs) and shards over 'data'."""
        n_req = len(images)
        images = list(images)
        if self.mesh is not None and n_req % self.mesh.size:
            pad = -(-n_req // self.mesh.size) * self.mesh.size - n_req
            images += [self.blank_row()] * pad
        canvas, hs, ws = pack_canvas(images, quantize=True)
        if bucket is None:
            bucket = self.resolve_bucket(images)
        if self.mesh is not None:
            from crnn_ocr_tpu.parallel.mesh import batch_sharding

            sh = batch_sharding(self.mesh)
            canvas, hs, ws = (
                jax.device_put(a, sh) for a in (canvas, hs, ws)
            )
        x, w_new = preprocess_batch(
            canvas,
            hs,
            ws,
            out_h=self.cfg.height,
            out_w=bucket,
            normalize=self.normalize,
        )
        probs = self._fwd(self._vars, x)
        T = probs.shape[1]
        input_len = jnp.clip(
            w_new // self.cfg.width_downsample - self.cfg.ctc_time_slice,
            1,
            T,
        )
        return probs[:n_req], input_len[:n_req]

    @property
    def default_merge_repeated(self) -> bool:
        """Provenance-keyed beam extraction default: migrated Keras
        artifacts keep ``K.ctc_decode`` parity (TF-V1 merge, collapses
        double letters); own-trained models get standard CTC (no merge) —
        the V1 merge measurably corrupts accuracy on them
        (benchmarks/beam_value_eval_fonts_hard.json: WER 0.348 vs 0.166)."""
        return self.cfg.provenance == "keras_migrated"

    def predict(
        self,
        images: Sequence[np.ndarray],
        greedy: bool = True,
        beam_width: int = 10,
        top_paths: int = 1,
        merge_repeated: Optional[bool] = None,
        exact_tf: bool = False,
        timing: bool = False,
        bucket: Optional[int] = None,
        alignments: bool = False,
    ) -> List[Prediction]:
        """``merge_repeated`` (beam only): True = Keras/TF-V1 parity
        (repeated output labels merge even across blanks — collapses
        double letters); False = standard CTC beam (TF2 semantics);
        None (default) = keyed on model provenance
        (:attr:`default_merge_repeated` — parity for migrated Keras
        artifacts, standard CTC for own-trained checkpoints).
        Scores are identical either way; see ops/ctc.py::ctc_decode.

        ``alignments=True`` additionally fills each ``Prediction.spans``
        with per-character ``CharSpan`` localization from the SAME forward
        pass. Greedy mode localizes the argmax runs
        (``ops.ctc.ctc_greedy_alignment``); beam mode force-aligns the
        decoded top path (``ops.ctc.ctc_forced_alignment``, constrained
        Viterbi) so the spans always describe the RETURNED text."""
        if merge_repeated is None:
            merge_repeated = self.default_merge_repeated
        t0 = time.perf_counter()
        bucket = self.resolve_bucket(images, bucket)
        probs, input_len = self.predict_probs(images, bucket=bucket)
        spans_rows = None
        if greedy:
            decoded, score = ctc.ctc_greedy_decode(probs, input_len)
            decoded_list, scores = [decoded], np.asarray(score)
            if alignments:
                spans_rows = self._spans_rows(
                    images,
                    bucket,
                    *ctc.ctc_greedy_alignment(probs, input_len),
                )
        elif exact_tf:
            from crnn_ocr_tpu.ops.ctc_beam_exact import (
                ctc_beam_search_decode_exact,
            )

            decoded_list, scores = ctc_beam_search_decode_exact(
                np.asarray(probs),
                np.asarray(input_len),
                beam_width=beam_width,
                top_paths=top_paths,
                merge_repeated=merge_repeated,
            )
            scores = np.asarray(scores)
        else:
            decoded_list, scores = ctc.ctc_decode(
                probs,
                input_len,
                greedy=False,
                beam_width=beam_width,
                top_paths=top_paths,
                merge_repeated=merge_repeated,
            )
            scores = np.asarray(scores)
        if alignments and not greedy:
            # Force-align the decoded TOP path so spans describe the beam
            # text itself (constrained Viterbi — see ctc_forced_alignment).
            dec = jnp.asarray(np.asarray(decoded_list[0]))
            spans_rows = self._spans_rows(
                images,
                bucket,
                jnp.where(dec >= 0, dec, -1),
                *ctc.ctc_forced_alignment(
                    probs,
                    input_len,
                    jnp.maximum(dec, 0),
                    jnp.sum(dec >= 0, axis=1),
                )[:3],
            )
        dt = (time.perf_counter() - t0) * 1e3

        out = []
        rows_per_path = [ctc.trim_dense(d) for d in decoded_list]
        B = len(images)
        for b in range(B):
            cands = []
            for p in range(len(rows_per_path)):
                text = self.codec.labels_to_text(rows_per_path[p][b])
                s = float(scores[b, min(p, scores.shape[1] - 1)])
                cands.append((text, s))
            out.append(
                Prediction(
                    text=cands[0][0],
                    score=cands[0][1],
                    candidates=cands if len(cands) > 1 else None,
                    latency_ms=dt / B if timing else None,
                    spans=spans_rows[b] if spans_rows is not None else None,
                )
            )
        return out

    def predict_text(self, images: Sequence[np.ndarray], **kw) -> List[str]:
        return [p.text for p in self.predict(images, **kw)]

    def predict_with_alignment(
        self, images: Sequence[np.ndarray], bucket: Optional[int] = None
    ) -> List[List[CharSpan]]:
        """Greedy decode with per-character localization.

        Returns one ``CharSpan`` list per image; joining the chars equals
        ``predict_text(greedy=True)`` for the same bucket (tested). Frame
        runs come from ``ops.ctc.ctc_greedy_alignment``; spans convert
        model frames to original-image pixel columns through the time
        slice, the conv width-downsample, and the height-normalizing
        resize. Spans are nominal (receptive-field blur) but cover every
        frame that voted for the character.
        """
        bucket = self.resolve_bucket(images, bucket)
        probs, input_len = self.predict_probs(images, bucket=bucket)
        return self._spans_rows(
            images, bucket, *ctc.ctc_greedy_alignment(probs, input_len)
        )

    def _spans_rows(
        self, images, bucket, labels, starts, ends, confs
    ) -> List[List[CharSpan]]:
        """Convert on-device alignment arrays to per-image CharSpan lists
        in original-image pixel columns (shared by predict_with_alignment
        and predict(alignments=True))."""
        labels, starts, ends, confs = (
            np.asarray(labels),
            np.asarray(starts),
            np.asarray(ends),
            np.asarray(confs),
        )
        ds = self.cfg.width_downsample
        sl = self.cfg.ctc_time_slice
        out: List[List[CharSpan]] = []
        for b, img in enumerate(images):
            h, w = img.shape[:2]
            # Effective content width AFTER the resize: preprocess_batch
            # clamps w_new to the bucket (images wider than it squeeze), so
            # original x = resized x * w / w_new — NOT h / height, which is
            # only the aspect-preserving case (w_new unclamped).
            w_new = min(int(round(w * self.cfg.height / h)), bucket)
            scale = ds * w / max(w_new, 1)
            spans = []
            for j in range(labels.shape[1]):
                lab = int(labels[b, j])
                if lab < 0 or starts[b, j] < 0:
                    break
                # Consistent half-open pixel mapping: frame boundary k maps
                # to floor((k + sl) * scale) on BOTH sides, so spans of
                # adjacent runs tile without overlap at fractional scales.
                x0 = int(np.floor((starts[b, j] + sl) * scale))
                x1 = int(np.floor((ends[b, j] + 1 + sl) * scale))
                x0 = min(x0, max(w - 1, 0))
                x1 = min(max(x1, x0 + 1), w)
                spans.append(
                    CharSpan(
                        char=self.codec.labels_to_text([lab]),
                        x0=x0,
                        x1=x1,
                        conf=float(confs[b, j]),
                    )
                )
            out.append(spans)
        return out

    def predict_many(
        self,
        images: Sequence[np.ndarray],
        batch_size: int = 64,
        **kw,
    ) -> List[Prediction]:
        """Bucket-grouped batched inference over an arbitrary image list.

        Groups images by width bucket (the reference's C2 width-bucketing,
        applied at serving time), runs bucket-homogeneous batches (one
        compiled program per bucket, minimal padding waste), and returns
        predictions in the ORIGINAL order.
        """
        groups: dict = {}
        for i, im in enumerate(images):
            groups.setdefault(self.bucket_for(im), []).append(i)

        out: List[Optional[Prediction]] = [None] * len(images)
        for bucket in sorted(groups):
            idxs = groups[bucket]
            for k in range(0, len(idxs), batch_size):
                chunk = idxs[k : k + batch_size]
                preds = self.predict(
                    [images[i] for i in chunk], bucket=bucket, **kw
                )
                for i, p in zip(chunk, preds):
                    out[i] = p
        return out  # type: ignore[return-value]


def init_predictor(model_dir: str, **kw) -> Predictor:
    """Reference-parity loader: rebuilds the inference model from saved
    artifacts (orbax checkpoint + model_config.json + classes.json), the
    TPU-native analog of model_from_json + load_weights + pickle (C8).

    A directory holding REFERENCE artifacts instead (Keras .h5 weights +
    optional architecture JSON + classes.pkl) loads transparently via
    infer.keras_json.load_reference_model — reference users can point
    this at their existing model dir with no conversion step."""
    import os

    import jax

    from crnn_ocr_tpu.train.checkpoint import (
        CheckpointManager,
        load_codec,
        load_model_config,
    )
    from crnn_ocr_tpu.train.state import create_train_state

    if not os.path.exists(
        os.path.join(model_dir, "model_config.json")
    ) and any(n.endswith(".h5") for n in os.listdir(model_dir)):
        from crnn_ocr_tpu.infer.keras_json import load_reference_model
        from crnn_ocr_tpu.models import resolve_runtime_flags

        cfg, params, batch_stats, codec = load_reference_model(model_dir)
        if codec is None:
            raise FileNotFoundError(
                f"{model_dir}: reference .h5 found but no class map "
                "(classes.pkl / classes.json)"
            )
        cfg = resolve_runtime_flags(
            dataclasses.replace(cfg, use_pallas_rnn=None, use_fused_stem=None)
        )
        return Predictor(cfg, params, batch_stats, codec, **kw)

    cfg = load_model_config(model_dir)
    # Kernel-path knobs are runtime policy (params identical either way):
    # don't inherit whatever backend the checkpoint was TRAINED on —
    # re-resolve for THIS process. Same reset as load_pretrained.
    from crnn_ocr_tpu.models import resolve_runtime_flags

    cfg = resolve_runtime_flags(
        dataclasses.replace(cfg, use_pallas_rnn=None, use_fused_stem=None)
    )
    codec = load_codec(model_dir)
    template = create_train_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(model_dir)
    # restore only params+batch_stats: inference must not depend on which
    # optimizer/schedule wrote the checkpoint (their opt_state trees differ)
    params, batch_stats = mgr.restore_inference(
        template.params, template.batch_stats
    )
    return Predictor(cfg, params, batch_stats, codec, **kw)


def decode_predict_ctc(
    out,
    input_length=None,
    top_paths: int = 1,
    beam_width: int = 10,
    codec: Optional[LabelCodec] = None,
    merge_repeated: bool = True,
):
    """Reference-parity free function: decode softmax outputs to label
    sequences (and text when a codec is given). ``out``: (B, T, C) probs."""
    out = jnp.asarray(out)
    B, T, _ = out.shape
    if input_length is None:
        input_length = jnp.full((B,), T, jnp.int32)
    decoded_list, scores = ctc.ctc_decode(
        out,
        input_length,
        greedy=False,
        beam_width=beam_width,
        top_paths=top_paths,
        merge_repeated=merge_repeated,
    )
    paths = [ctc.trim_dense(d) for d in decoded_list]
    if codec is None:
        return paths, np.asarray(scores)
    texts = [
        [codec.labels_to_text(paths[p][b]) for p in range(top_paths)]
        for b in range(B)
    ]
    return texts, np.asarray(scores)


def predictor_from_cli(
    model: "str | None",
    pretrained: "str | None",
    normalize: bool = True,
    n_devices: int = 1,
    **kw,
) -> Predictor:
    """Shared CLI loader (predict + serve): resolves --model/--pretrained
    and the optional --n_devices data-parallel mesh in one place."""
    mesh = None
    if n_devices > 1:
        from crnn_ocr_tpu.parallel import make_mesh

        mesh = make_mesh(n_devices)
    if pretrained:
        from crnn_ocr_tpu.infer.pretrained import load_pretrained

        return load_pretrained(
            pretrained, normalize=normalize, mesh=mesh, **kw
        )
    if model:
        return init_predictor(model, normalize=normalize, mesh=mesh, **kw)
    raise SystemExit("one of --model / --pretrained is required")
