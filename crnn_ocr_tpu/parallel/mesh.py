"""Device mesh + SPMD sharding helpers (the framework's parallelism layer).

The reference's only parallelism is in-graph data parallelism via Keras
``multi_gpu_model`` (SURVEY.md §2.3): batch split across towers, gradients
averaged on a parameter device, no collective library. The TPU-native
equivalent is declarative: build a ``jax.sharding.Mesh``, annotate the batch
as sharded over ``('data',)`` and params as replicated, and let GSPMD insert
``psum``s over ICI. Mesh axes ``('data', 'model')`` are named now so tensor
parallelism can be added without API changes (the flagship model is ~3M
params — nothing to shard today).

Works identically on a real v5e slice and on the CPU-simulated 8-device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), which is how tests and
the driver's ``dryrun_multichip`` validate multi-chip behavior here
(single-chip machine).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices or jax.devices())
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch on the mesh, batch-axis-sharded.

    Non-array entries (e.g. 'texts', 'bucket') pass through untouched.
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def shard_stacked_batch(stack: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a K-leading stacked batch group (``data.pipeline.
    stack_host_batches``) on the mesh: the K (inner-step) axis is a scan
    axis and stays replicated; the batch axis (axis 1) shards over 'data'
    — the same layout the single-step DP path gives each scan slice.
    1-D arrays (e.g. ``batch_index`` (K,)) replicate."""
    sh2 = NamedSharding(mesh, P(None, "data"))
    rep = replicated(mesh)
    out = {}
    for k, v in stack.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 2:
            out[k] = jax.device_put(v, sh2)
        elif hasattr(v, "shape") and getattr(v, "ndim", 0) == 1:
            out[k] = jax.device_put(v, rep)
        else:
            out[k] = v
    return out


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a train-state pytree across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, state
    )


def pad_batch_to(batch: Dict[str, Any], size: int) -> Dict[str, Any]:
    """Pad the batch axis up to ``size`` (divisibility for DP sharding).

    Padded samples get input_length=1 and label_length=0 (their raw loss is
    -log p(blank) for one frame, NOT zero), so a ``valid_mask`` float array
    is added: the train step computes a masked mean, zeroing the padding's
    loss and gradient contribution exactly, and threads the mask into the
    model's BatchNorm layers so batch statistics are computed over valid
    rows only — a padded step is bit-equivalent to the unpadded step,
    including updated batch_stats.
    """
    b = next(v.shape[0] for v in batch.values() if hasattr(v, "shape"))
    if b == size:
        return batch
    pad = size - b
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == b:
            widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(np.asarray(v), widths)
        else:
            out[k] = v
    if "input_length" in out:
        il = np.asarray(out["input_length"])
        il[b:] = 1
        out["input_length"] = il
    mask = np.zeros((size,), np.float32)
    mask[:b] = 1.0
    out["valid_mask"] = mask
    return out
