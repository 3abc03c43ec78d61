"""Max pooling with a TPU-fast backward (reference C4's MaxPooling2D).

``nn.max_pool``'s VJP lowers to XLA ``select-and-scatter``, a serial
window-walk that measured ~0.85 ms/step of the B=128 train step (trace:
select-and-scatter.{1..4}). Every pool in the CRNN backbone is
non-overlapping (window == strides), so the pool decomposes into ph*pw
strided slices and the backward into a first-max mask + interior-padded
(dilated) writes — all 4D NHWC ops; no scatter, and no 6D window-view
transposes (a reshape-based variant was tried first and cost MORE than
select-and-scatter in layout copies: f32[128,16,2,64,2,64] copy chains at
~2 ms/step on v5e).

Tie semantics match both XLA's select-and-scatter (GE select keeps the
earlier element) and TF's Eigen MaxPoolGrad (strict-> argmax update):
the FIRST maximum in row-major window order receives the whole gradient.
That keeps the TF GradientTape parity suite (tests/test_grad_parity.py)
exact even on post-ReLU zero ties.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _parts(x: jnp.ndarray, pool: Tuple[int, int]):
    """The ph*pw strided window slices, row-major window order."""
    ph, pw = pool
    return [
        x[:, i::ph, j::pw, :] for i in range(ph) for j in range(pw)
    ]


def max_pool_fast(x: jnp.ndarray, pool: Tuple[int, int]) -> jnp.ndarray:
    """Non-overlapping max pool (window == strides), NHWC, VALID padding.

    Falls back to flax's reduce-window pool when a spatial dim is not
    divisible by the window (VALID padding floors there; the strided
    decomposition can't express the ragged tail)."""
    _, H, W, _ = x.shape
    if H % pool[0] or W % pool[1]:
        from flax import linen as nn

        return nn.max_pool(x, pool, strides=pool)
    return _max_pool_strided(x, tuple(pool))


def _reduce_window_max(x: jnp.ndarray, pool: Tuple[int, int]) -> jnp.ndarray:
    # XLA's native reduce-window is the fastest FORWARD on TPU (the strided
    # slice decomposition measured ~40% slower end-to-end on w256 serving —
    # stride-2 sublane reads are relayout-heavy); only the BACKWARD
    # (select-and-scatter) needs replacing.
    init = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    return lax.reduce_window(
        x, jnp.asarray(init, x.dtype), lax.max,
        (1, pool[0], pool[1], 1), (1, pool[0], pool[1], 1), "VALID",
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_strided(x: jnp.ndarray, pool: Tuple[int, int]) -> jnp.ndarray:
    return _reduce_window_max(x, pool)


def _fwd(x, pool):
    return _reduce_window_max(x, pool), x


def _bwd(pool, x, g):
    ph, pw = pool
    parts = _parts(x, pool)
    y = parts[0]
    for p in parts[1:]:
        y = jnp.maximum(y, p)
    zero = jnp.zeros((), g.dtype)
    gx = None
    taken = None
    for k, p in enumerate(parts):
        i, j = divmod(k, pw)
        eq = p == y
        take = eq if taken is None else (eq & ~taken)
        taken = eq if taken is None else (taken | eq)
        contrib = jnp.where(take, g, zero)
        # place at stride-(ph,pw) offsets via interior (dilation) padding —
        # XLA-native on TPU (same primitive conv input-grads use)
        gk = lax.pad(
            contrib, zero,
            ((0, 0, 0),
             (i, ph - 1 - i, ph - 1),
             (j, pw - 1 - j, pw - 1),
             (0, 0, 0)),
        )
        gx = gk if gx is None else gx + gk
    return (gx,)


_max_pool_strided.defvjp(_fwd, _bwd)
