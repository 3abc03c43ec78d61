"""Pallas fused BiGRU recurrence (reference C16's hot loop, on the MXU).

The lax.scan BiRNN (models/rnn.py) already hoists the input projections into
one big matmul; what remains per step is the hidden-state matmul + gate
elementwise math. This kernel runs that remainder as ONE Pallas program with
a sequential grid over time:

  * grid=(T,): TPU grid steps execute in order, so VMEM scratch carries the
    hidden state h across steps — no HBM round-trip for the carry;
  * the recurrent weights U (2, H, 3H) use a constant index_map, so Pallas
    keeps them VMEM-resident across all T steps (loaded once);
  * per-step xw blocks stream HBM->VMEM double-buffered by the Pallas
    pipeline while the previous step computes;
  * both directions are batched into one (2, B, H) x (2, H, 3H) dot_general
    per step (the backward direction's input is pre-reversed by the caller,
    exactly like models/rnn.py).

Training uses a custom VJP whose backward recomputes via the reference
lax.scan implementation (rematerialization: same math, autodiff'd), so the
kernel is usable in both inference and training graphs.

Alignment: H and B should be multiples of 128/8 for MXU tiling (flagship
H=256, B>=8). ``bigru_available`` gates fallback to the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_gate_math(h, xw_t, rec, H):
    xz, xr, xh = xw_t[..., :H], xw_t[..., H : 2 * H], xw_t[..., 2 * H :]
    rz, rr, rh = rec[..., :H], rec[..., H : 2 * H], rec[..., 2 * H :]
    z = jax.nn.sigmoid(xz + rz)
    r = jax.nn.sigmoid(xr + rr)
    hh = jnp.tanh(xh + r * rh)
    return z * h + (1.0 - z) * hh


def _kernel(xw_ref, u_ref, b_ref, out_ref, h_scratch):
    t = pl.program_id(0)
    D, B, H = h_scratch.shape

    @pl.when(t == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    # Plain 2-D dots per direction (Mosaic rejects batched dot_general).
    for d in range(D):
        h = h_scratch[d]  # (B, H) f32
        rec = jnp.dot(
            h.astype(u_ref.dtype),
            u_ref[d],
            preferred_element_type=jnp.float32,
        )  # (B, 3H)
        rec = rec + b_ref[d][None, :].astype(jnp.float32)
        xw_t = xw_ref[0, d].astype(jnp.float32)  # (B, 3H)
        h_new = _gru_gate_math(h, xw_t, rec, H)
        h_scratch[d] = h_new
        out_ref[0, d] = h_new.astype(out_ref.dtype)


def bigru_pallas_raw(
    xw: jnp.ndarray,
    u: jnp.ndarray,
    rec_bias: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused recurrence.

    Args:
      xw: (T, 2, B, 3H) input projections (+input bias), direction 1
        time-reversed.
      u: (2, H, 3H) recurrent kernels.
      rec_bias: (2, 3H) recurrent biases (Keras reset_after convention).

    Returns:
      hs: (T, 2, B, H) hidden states (direction 1 still time-reversed).
    """
    T, D, B, G = xw.shape
    H = G // 3
    return pl.pallas_call(
        _kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, D, B, G), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((D, H, G), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, G), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, D, B, H), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, D, B, H), xw.dtype),
        scratch_shapes=[pltpu.VMEM((D, B, H), jnp.float32)],
        interpret=interpret,
    )(xw, u, rec_bias)


def _bigru_scan_ref(xw, u, rec_bias):
    """lax.scan reference with identical math (backward pass + fallback)."""
    T, D, B, G = xw.shape
    H = G // 3

    def step(h, xw_t):
        rec = (
            jnp.einsum(
                "dbh,dhg->dbg",
                h,
                u,
                preferred_element_type=jnp.float32,
            )
            + rec_bias[:, None, :]
        )
        h_new = _gru_gate_math(h, xw_t.astype(jnp.float32), rec, H)
        return h_new.astype(xw.dtype), h_new.astype(xw.dtype)

    h0 = jnp.zeros((D, B, H), xw.dtype)
    _, hs = jax.lax.scan(step, h0, xw)
    return hs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bigru_fused(xw, u, rec_bias, interpret=False):
    """Fused BiGRU recurrence: Pallas forward, remat-scan backward."""
    return bigru_pallas_raw(xw, u, rec_bias, interpret=interpret)


def _fwd(xw, u, rec_bias, interpret):
    out = bigru_pallas_raw(xw, u, rec_bias, interpret=interpret)
    return out, (xw, u, rec_bias)


def _bwd(interpret, residuals, g):
    xw, u, rec_bias = residuals
    _, vjp = jax.vjp(_bigru_scan_ref, xw, u, rec_bias)
    return vjp(g)


bigru_fused.defvjp(_fwd, _bwd)


def bigru_supported(B: int, H: int) -> bool:
    """Shape gate for the fused kernel (MXU/VPU tiling)."""
    return H % 128 == 0 and B % 8 == 0


# ---------------------------------------------------------------------------
# Fused BiLSTM (same design: sequential grid over T, h/c carried in VMEM
# scratch, recurrent weights VMEM-resident, both directions per step).
# Keras LSTM conventions: gate order i|f|c|o, single bias (already folded
# into xw by models/rnn.py), unit forget bias at init.
# ---------------------------------------------------------------------------


def _lstm_gate_math(h, c, xw_t, rec, H):
    gates = xw_t + rec
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _lstm_kernel(xw_ref, u_ref, out_ref, h_scratch, c_scratch):
    t = pl.program_id(0)
    D, B, H = h_scratch.shape

    @pl.when(t == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)
        c_scratch[...] = jnp.zeros_like(c_scratch)

    for d in range(D):
        h = h_scratch[d]
        c = c_scratch[d]
        rec = jnp.dot(
            h.astype(u_ref.dtype),
            u_ref[d],
            preferred_element_type=jnp.float32,
        )  # (B, 4H)
        xw_t = xw_ref[0, d].astype(jnp.float32)
        h_new, c_new = _lstm_gate_math(h, c, xw_t, rec, H)
        h_scratch[d] = h_new
        c_scratch[d] = c_new
        out_ref[0, d] = h_new.astype(out_ref.dtype)


def bilstm_pallas_raw(
    xw: jnp.ndarray, u: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """xw: (T, 2, B, 4H) input projections (+bias), dir 1 time-reversed;
    u: (2, H, 4H) recurrent kernels. Returns (T, 2, B, H)."""
    T, D, B, G = xw.shape
    H = G // 4
    return pl.pallas_call(
        _lstm_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, D, B, G), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((D, H, G), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, D, B, H), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, D, B, H), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, u)


def _bilstm_scan_ref(xw, u):
    """lax.scan reference with identical math (backward pass + fallback)."""
    T, D, B, G = xw.shape
    H = G // 4

    def step(carry, xw_t):
        h, c = carry
        rec = jnp.einsum(
            "dbh,dhg->dbg", h.astype(xw.dtype), u,
            preferred_element_type=jnp.float32,
        )
        h_new, c_new = _lstm_gate_math(
            h, c, xw_t.astype(jnp.float32), rec, H
        )
        return (h_new, c_new), h_new.astype(xw.dtype)

    h0 = jnp.zeros((D, B, H), jnp.float32)
    _, hs = jax.lax.scan(step, (h0, h0), xw)
    return hs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilstm_fused(xw, u, interpret=False):
    """Fused BiLSTM recurrence: Pallas forward, remat-scan backward."""
    return bilstm_pallas_raw(xw, u, interpret=interpret)


def _lstm_fwd(xw, u, interpret):
    return bilstm_pallas_raw(xw, u, interpret=interpret), (xw, u)


def _lstm_bwd(interpret, residuals, g):
    xw, u = residuals
    _, vjp = jax.vjp(_bilstm_scan_ref, xw, u)
    return vjp(g)


bilstm_fused.defvjp(_lstm_fwd, _lstm_bwd)
