"""Spatial Transformer Network front-end (reference C5, TPU-native).

The reference prepends an affine STN to the backbone when flagged: a small
localization CNN -> Dense(6) initialized to the identity transform
``[1, 0, 0, 0, 1, 0]`` -> bilinear grid-sampler, trained end-to-end by the
same CTC loss with no extra supervision (SURVEY.md §3.4). Here the sampler
is the batched XLA gather kernel in crnn_ocr_tpu.ops.grid_sample.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from crnn_ocr_tpu.ops.grid_sample import grid_sample_affine


class STN(nn.Module):
    """Affine spatial transformer: predicts theta, warps the input.

    Input (B, H, W, C) -> warped (B, H, W, C) (same size, like the
    reference's front-end).
    """

    loc_filters: Sequence[int] = (16, 32)
    loc_dense: int = 50
    dtype: jnp.dtype = jnp.float32
    # GSPMD mesh when data-parallel (Pallas sampler runs per shard via
    # shard_map); interpret runs the kernel in interpreter mode (CPU tests).
    mesh: object = None
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = x.shape[0]
        h = x.astype(self.dtype)
        # Localization network: cheap strided convs, global pooling, MLP.
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        for filters in self.loc_filters:
            h = nn.Conv(filters, (5, 5), padding="SAME", dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = h.reshape(B, -1)
        h = nn.Dense(self.loc_dense, dtype=self.dtype)(h)
        h = nn.relu(h)
        # Identity-initialized affine head: zero kernel + identity bias.
        theta = nn.Dense(
            6,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=self.dtype: jnp.array(
                [1.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype
            ),
            dtype=self.dtype,
        )(h)
        return grid_sample_affine(
            x, theta, mesh=self.mesh, interpret=self.pallas_interpret
        )
