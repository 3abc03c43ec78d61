"""Checkpoint/resume via orbax over TensorStore (SURVEY.md §5.4).

The reference saved best/latest .h5 weights + architecture JSON +
classes.pkl via Keras ModelCheckpoint; optimizer state was lost on resume.
Here the FULL train state (params, optimizer slots, BN stats, step) persists
atomically, alongside the model config and label codec, so resume is exact.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


_intended_metricless_saves = 0  # armed by CheckpointManager.save below


class _DropMetriclessSaveNoise(logging.Filter):
    """Metric-less saves (the final latest-state save of every run) are an
    intended mode here — ``keep_checkpoints_without_metrics=True`` — but
    orbax still logs 'Requested `tracked_metric`; did not provide metrics'
    at WARNING on each one. Drop exactly that message, and ONLY when one of
    OUR saves armed it — other orbax managers in the same process keep the
    warning (there it can flag a real forgot-to-pass-metrics bug)."""

    def filter(self, rec: logging.LogRecord) -> bool:
        global _intended_metricless_saves
        if (_intended_metricless_saves > 0
                and "did not provide metrics" in rec.getMessage()):
            _intended_metricless_saves -= 1
            return False
        return True


logging.getLogger("absl").addFilter(_DropMetriclessSaveNoise())

from crnn_ocr_tpu.data.codec import LabelCodec
from crnn_ocr_tpu.models import ModelConfig


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        track_metric: Optional[str] = None,
        track_mode: str = "min",
    ):
        """``track_metric`` (e.g. ``"cer"``) makes rotation keep the BEST
        ``max_to_keep`` checkpoints by that metric instead of the newest —
        the reference's ``ModelCheckpoint(save_best_only=True)`` behavior.
        Saves without metrics (e.g. the final latest-state save) are always
        retained, so resume-from-latest keeps working alongside."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.track_metric = track_metric
        opts = dict(max_to_keep=max_to_keep, create=True)
        if track_metric is not None:
            opts["best_fn"] = lambda m: float(m[track_metric])
            opts["best_mode"] = track_mode
            opts["keep_checkpoints_without_metrics"] = True
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(**opts),
        )

    def save(
        self,
        step: int,
        state: Any,
        model_cfg: Optional[ModelConfig] = None,
        codec: Optional[LabelCodec] = None,
        metrics: Optional[dict] = None,
    ) -> None:
        save_metrics = None
        if metrics is not None and self.track_metric is not None:
            v = metrics.get(self.track_metric)
            if v is not None and v == v:  # tracked metric present, not NaN
                save_metrics = {k: float(x) for k, x in metrics.items()}
        if save_metrics is None and self.track_metric is not None:
            global _intended_metricless_saves
            _intended_metricless_saves += 1  # see _DropMetriclessSaveNoise
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state)),
            metrics=save_metrics,
        )
        if model_cfg is not None:
            cfg_dict = dataclasses.asdict(model_cfg)
            # tuples -> lists for JSON round-trip
            with open(os.path.join(self.directory, "model_config.json"), "w") as f:
                json.dump(cfg_dict, f, indent=1, default=list)
        if codec is not None:
            codec.save(os.path.join(self.directory, "classes.json"))
        if metrics is not None:
            with open(
                os.path.join(self.directory, f"metrics_{step}.json"), "w"
            ) as f:
                json.dump(
                    {k: float(v) for k, v in metrics.items()}, f, indent=1
                )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        """Step of the best checkpoint by the tracked metric (None when
        nothing tracked yet); falls back to latest."""
        s = self._mgr.best_step()
        return s if s is not None else self._mgr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        # Pin a concrete local sharding on every leaf: checkpoints written on
        # one backend (e.g. the TPU tunnel) must restore on another (CPU) —
        # without this orbax tries the recorded (foreign) sharding and fails.
        dev = jax.devices()[0]
        sharding = jax.sharding.SingleDeviceSharding(dev)

        def with_sharding(x):
            if isinstance(x, jax.ShapeDtypeStruct):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return jax.ShapeDtypeStruct(
                    x.shape, x.dtype, sharding=sharding
                )
            return x

        abstract_state = jax.tree.map(with_sharding, abstract_state)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )

    def restore_inference(
        self, abstract_params: Any, abstract_batch_stats: Any,
        step: Optional[int] = None,
    ) -> Tuple[Any, Any]:
        """Restore only params + batch_stats from a full-train-state
        checkpoint (inference loading must not depend on which optimizer/
        schedule produced the checkpoint — their opt_state trees differ).

        Builds the abstract restore tree from the CHECKPOINT'S OWN metadata
        (so any optimizer/schedule state restores transparently) and returns
        the two subtrees the forward pass needs.
        """
        del abstract_params, abstract_batch_stats  # shapes come from disk
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        dev = jax.devices()[0]
        sharding = jax.sharding.SingleDeviceSharding(dev)
        meta = ocp.StandardCheckpointer().metadata(
            os.path.join(self.directory, str(step), "default")
        )
        tree = meta.item_metadata.tree

        def w(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return jax.ShapeDtypeStruct(
                    tuple(x.shape), x.dtype, sharding=sharding
                )
            return x

        abstract = jax.tree.map(w, tree)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )
        return restored["params"], restored["batch_stats"]


def load_model_config(directory: str) -> ModelConfig:
    with open(os.path.join(directory, "model_config.json")) as f:
        d = json.load(f)
    d["block_filters"] = tuple(d["block_filters"])
    d["block_pools"] = tuple(tuple(p) for p in d["block_pools"])
    return ModelConfig(**d)


def load_codec(directory: str) -> LabelCodec:
    return LabelCodec.load(os.path.join(directory, "classes.json"))
