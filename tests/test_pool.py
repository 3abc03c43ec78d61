"""max_pool_fast == nn.max_pool in value AND gradient (incl. tie routing).

The fast pool replaces XLA select-and-scatter in the backward; ties must
still route the gradient to the FIRST window maximum (select-and-scatter's
GE-select semantics, also TF MaxPoolGrad's) — post-ReLU zero ties make this
case common, not exotic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from crnn_ocr_tpu.ops.pool import max_pool_fast


@pytest.mark.parametrize("pool", [(2, 2), (2, 1), (1, 2)])
@pytest.mark.parametrize("ties", [False, True])
def test_pool_matches_select_and_scatter(pool, ties):
    rng = np.random.default_rng(hash((pool, ties)) % 2**31)
    x = rng.normal(size=(3, 8, 12, 5)).astype(np.float32)
    if ties:  # quantize hard so most windows contain exact ties
        x = np.round(x).astype(np.float32)
    x = jnp.asarray(x)

    ref = lambda v: nn.max_pool(v, pool, strides=pool)
    np.testing.assert_array_equal(
        np.asarray(max_pool_fast(x, pool)), np.asarray(ref(x))
    )

    g = jnp.asarray(
        rng.normal(size=ref(x).shape).astype(np.float32)
    )
    grad_fast = jax.grad(lambda v: jnp.sum(max_pool_fast(v, pool) * g))(x)
    grad_ref = jax.grad(lambda v: jnp.sum(ref(v) * g))(x)
    np.testing.assert_array_equal(np.asarray(grad_fast), np.asarray(grad_ref))


def test_pool_non_divisible_falls_back():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, 9, 3)),
                    jnp.float32)
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(
        np.asarray(max_pool_fast(x, (2, 2))), np.asarray(ref)
    )
