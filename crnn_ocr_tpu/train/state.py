"""Train state: params + optimizer + BN stats + step, one pytree.

The reference's training state was implicit in Keras (model weights +
optimizer slots inside fit(); BN moving stats inside layers; optimizer state
NOT checkpointed — SURVEY.md §5.4). Here it's an explicit flax TrainState so
the whole thing checkpoints/resumes atomically via orbax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from crnn_ocr_tpu.models import CRNN, ModelConfig


class TrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default=None)


def make_schedule(
    name: str,
    learning_rate: float,
    total_steps: int = 10_000,
    warmup_steps: int = 0,
):
    """LR schedules (the reference era used a cyclic-LR Keras callback)."""
    name = (name or "constant").lower()
    if name == "constant":
        sched = learning_rate
    elif name == "cosine":
        sched = optax.cosine_decay_schedule(
            learning_rate, decay_steps=max(total_steps, 1)
        )
    elif name == "cyclic":
        # triangular cyclic LR between lr/10 and lr
        period = max(total_steps // 8, 100)
        sched = optax.join_schedules(
            [
                optax.linear_schedule(
                    learning_rate / 10, learning_rate, period // 2
                ),
                optax.linear_schedule(
                    learning_rate, learning_rate / 10, period - period // 2
                ),
            ]
            * 8,
            boundaries=list(
                jnp.cumsum(
                    jnp.array(
                        [period // 2, period - period // 2] * 8
                    )
                )[:-1]
            ),
        )
    else:
        raise ValueError(f"unknown schedule {name!r}")
    if warmup_steps:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps), sched],
            boundaries=[warmup_steps],
        )
    return sched


def make_optimizer(
    name: str = "adam",
    learning_rate: float = 1e-3,
    clipnorm: float = 5.0,
    schedule: str = "constant",
    total_steps: int = 10_000,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """The reference exposes an optimizer-choice flag (C10); same menu."""
    lr = make_schedule(schedule, learning_rate, total_steps, warmup_steps)
    name = name.lower()
    if name == "adam":
        tx = optax.adam(lr)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=0.9)
    elif name == "rmsprop":
        tx = optax.rmsprop(lr)
    elif name == "adadelta":
        tx = optax.adadelta(lr)
    elif name == "adamw":
        tx = optax.adamw(lr)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if clipnorm:
        tx = optax.chain(optax.clip_by_global_norm(clipnorm), tx)
    return tx


def create_train_state(
    cfg: ModelConfig,
    rng: jax.Array,
    optimizer: str = "adam",
    learning_rate: float = 1e-3,
    batch_size: int = 2,
    schedule: str = "constant",
    total_steps: int = 10_000,
    warmup_steps: int = 0,
    mesh=None,
    pallas_interpret: bool = False,
) -> TrainState:
    model = CRNN(cfg=cfg, mesh=mesh, pallas_interpret=pallas_interpret)
    x = jnp.zeros((batch_size, cfg.height, cfg.width, 1), jnp.float32)
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng}, x, train=False
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer(
            optimizer,
            learning_rate,
            schedule=schedule,
            total_steps=total_steps,
            warmup_steps=warmup_steps,
        ),
        batch_stats=variables["batch_stats"],
    )


def param_count(state: TrainState) -> int:
    return sum(
        int(jnp.size(p)) for p in jax.tree_util.tree_leaves(state.params)
    )
