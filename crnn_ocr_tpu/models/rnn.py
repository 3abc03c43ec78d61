"""Bidirectional GRU/LSTM as MXU-friendly time-major scans.

TPU-native replacement for the reference's ``Bidirectional(GRU/LSTM(...))``
layers (SURVEY.md C16), which Keras executes as a TF ``while_loop`` per
direction. Design (SURVEY.md §7.5 "BiGRU on MXU"):

  * The input projection ``x @ W`` for ALL timesteps and BOTH directions is
    hoisted out of the recurrence into one large batched matmul
    ((T*B, F) @ (F, 2*3H)) that tiles onto the 128x128 MXU.
  * Only the hidden-to-hidden matmul stays inside ``lax.scan``; forward and
    backward directions run in a single scan with the backward input
    time-reversed, so the per-step matmul is (2B, H) @ (H, 3H) instead of
    two (B, H) matmuls — twice the MXU occupancy for the same latency.
  * Gate equations follow Keras conventions exactly (GRU: reset_after=True,
    gate order z|r|h, dual bias; LSTM: gate order i|f|c|o, unit forget bias)
    so reference .h5 weights can be imported 1:1 for equal-weight parity.

The fused Pallas cell (weights VMEM-resident across timesteps) lives in
crnn_ocr_tpu.kernels.bigru — opt-in via ``use_pallas`` (1.56x over this
scan at flagship shapes on v5e).
"""

from __future__ import annotations

from typing import Literal, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def pallas_rnn_default() -> bool:
    """Auto policy for the fused Pallas recurrence: on for TPU backends.

    (Multi-device GSPMD meshes resolve this to False at model-build time —
    see ``models.crnn.resolve_runtime_flags`` — until the kernel carries an
    SPMD partitioning rule.)"""
    return jax.default_backend() in ("tpu", "axon")


class BiRNN(nn.Module):
    """Bidirectional GRU/LSTM with concatenated outputs (Keras-equivalent).

    Input/output are batch-major (B, T, F) -> (B, T, 2*units).
    """

    units: int
    cell: Literal["gru", "lstm"] = "gru"
    dtype: jnp.dtype = jnp.float32
    # Use the fused Pallas recurrence (crnn_ocr_tpu.kernels.bigru) when the
    # shapes are MXU-aligned; None = auto (on for TPU backends). Falls back
    # to lax.scan otherwise.
    use_pallas: Optional[bool] = None
    pallas_interpret: bool = False
    # GSPMD mesh the enclosing jit shards the batch over. A bare Pallas
    # custom call has no SPMD partitioning rule, so with a multi-device
    # mesh the fused cell runs per shard via jax.shard_map (batch is the
    # only sharded axis; weights replicate).
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, F = x.shape
        H = self.units
        ngates = 3 if self.cell == "gru" else 4

        # Params stored f32 (flax convention: param_dtype f32, compute in
        # self.dtype); storing bf16 params breaks orthogonal init's QR on
        # CPU and costs training precision.
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (2, F, ngates * H),
            jnp.float32,
        )
        recurrent_kernel = self.param(
            "recurrent_kernel",
            nn.initializers.orthogonal(),
            (2, H, ngates * H),
            jnp.float32,
        )
        if self.cell == "gru":
            # Keras reset_after=True: separate input/recurrent biases.
            bias = self.param(
                "bias", nn.initializers.zeros, (2, 2, ngates * H),
                jnp.float32,
            )
        else:

            def lstm_bias_init(key, shape, dtype):
                # Keras unit_forget_bias: f-gate bias starts at 1.
                b = jnp.zeros(shape, dtype)
                return b.at[..., H : 2 * H].set(1.0)

            bias = self.param(
                "bias", lstm_bias_init, (2, ngates * H), jnp.float32
            )

        x = x.astype(self.dtype)
        # (2, T, B, F): dir 0 forward, dir 1 time-reversed for the bwd pass.
        xt = jnp.transpose(x, (1, 0, 2))
        x2 = jnp.stack([xt, xt[::-1]], axis=0)

        # Hoisted input projection: one big MXU matmul per direction
        # (inputs in compute dtype, f32 accumulation).
        xw = jnp.einsum(
            "dtbf,dfg->dtbg", x2, kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.cell == "gru":
            xw = xw + bias[:, 0][:, None, None, :]
            rec_bias = bias[:, 1]  # (2, 3H)
        else:
            xw = xw + bias[:, None, None, :]
            rec_bias = None

        h0 = jnp.zeros((2, B, H), self.dtype)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = pallas_rnn_default()
        if use_pallas:
            from crnn_ocr_tpu.kernels.bigru import (
                bigru_fused,
                bigru_supported,
                bilstm_fused,
            )

            n_shards = self.mesh.size if self.mesh is not None else 1
            B_loc = B // n_shards if B % n_shards == 0 else 0
            if B_loc and bigru_supported(B_loc, H):
                xw_t = jnp.transpose(xw, (1, 0, 2, 3)).astype(self.dtype)
                interp = self.pallas_interpret
                if self.cell == "gru":
                    call = lambda xw_, u_, b_: bigru_fused(  # noqa: E731
                        xw_, u_, b_, interp
                    )
                    args = (
                        xw_t,
                        recurrent_kernel.astype(self.dtype),
                        rec_bias.astype(jnp.float32),
                    )
                else:
                    call = lambda xw_, u_: bilstm_fused(  # noqa: E731
                        xw_, u_, interp
                    )
                    args = (xw_t, recurrent_kernel.astype(self.dtype))
                if n_shards > 1:
                    from jax.sharding import PartitionSpec as P

                    axis = self.mesh.axis_names[0]
                    bspec = P(None, None, axis, None)
                    rep = P(*(None,) * (len(args[1].shape)))
                    in_specs = (bspec, rep) + (
                        (P(None, None),) if self.cell == "gru" else ()
                    )
                    # check_vma=False: pallas_call out_shapes carry no
                    # varying-mesh-axes metadata (same as the CTC kernel)
                    call = jax.shard_map(
                        call, mesh=self.mesh, in_specs=in_specs,
                        out_specs=bspec, check_vma=False,
                    )
                hs = call(*args)  # (T, 2, B, H)
                fwd = hs[:, 0]
                bwd = hs[::-1, 1]
                out = jnp.concatenate([fwd, bwd], axis=-1)
                return jnp.transpose(out, (1, 0, 2))

        if self.cell == "gru":

            def step(h, xw_t):
                # h: (2, B, H); xw_t: (2, B, 3H)
                rec = (
                    jnp.einsum(
                        "dbh,dhg->dbg", h,
                        recurrent_kernel.astype(self.dtype),
                        preferred_element_type=jnp.float32,
                    )
                    + rec_bias[:, None, :]
                )
                xz, xr, xh = jnp.split(xw_t, 3, axis=-1)
                rz, rr, rh = jnp.split(rec, 3, axis=-1)
                z = jax.nn.sigmoid(xz + rz)
                r = jax.nn.sigmoid(xr + rr)
                hh = jnp.tanh(xh + r * rh)
                # gate math accumulates f32; carried state in module dtype
                h_new = (z * h + (1.0 - z) * hh).astype(self.dtype)
                return h_new, h_new

            _, hs = jax.lax.scan(step, h0, jnp.transpose(xw, (1, 0, 2, 3)))
        else:
            c0 = jnp.zeros((2, B, H), self.dtype)

            def step(carry, xw_t):
                h, c = carry
                rec = jnp.einsum(
                    "dbh,dhg->dbg", h,
                    recurrent_kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                )
                gates = xw_t + rec
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i = jax.nn.sigmoid(i)
                f = jax.nn.sigmoid(f)
                g = jnp.tanh(g)
                o = jax.nn.sigmoid(o)
                c_new = (f * c + i * g).astype(self.dtype)
                h_new = (o * jnp.tanh(c_new.astype(jnp.float32))).astype(
                    self.dtype
                )
                return (h_new, c_new), h_new

            _, hs = jax.lax.scan(
                step, (h0, c0), jnp.transpose(xw, (1, 0, 2, 3))
            )

        # hs: (T, 2, B, H) -> forward as-is, backward un-reversed.
        fwd = hs[:, 0]  # (T, B, H)
        bwd = hs[::-1, 1]  # (T, B, H)
        out = jnp.concatenate([fwd, bwd], axis=-1)  # (T, B, 2H)
        return jnp.transpose(out, (1, 0, 2))  # (B, T, 2H)
