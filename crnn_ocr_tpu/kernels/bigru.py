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

Training uses a custom VJP with an ANALYTIC backward: under ``grad`` the
forward kernel also streams out the gate activations (z, r, hh, rh), so the
backward is a single reverse ``lax.scan`` carrying only dh with ONE
(B,3H)x(3H,H) matmul per step — no forward replay — and the weight/bias
gradients hoist into two big post-scan contractions. (The first version
remat'd through an autodiff'd lax.scan reference: that paid a full forward
re-scan plus a 3-matmul/step backward, and measured as the dominant RNN
cost in the r2 train trace.)

Alignment: H and B should be multiples of 128/8 for MXU tiling (flagship
H=256, B>=8). ``bigru_available`` gates fallback to the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_gate_math(h, xw_t, rec, H, with_gates=False):
    xz, xr, xh = xw_t[..., :H], xw_t[..., H : 2 * H], xw_t[..., 2 * H :]
    rz, rr, rh = rec[..., :H], rec[..., H : 2 * H], rec[..., 2 * H :]
    z = jax.nn.sigmoid(xz + rz)
    r = jax.nn.sigmoid(xr + rr)
    hh = jnp.tanh(xh + r * rh)
    h_new = z * h + (1.0 - z) * hh
    if with_gates:
        return h_new, (z, r, hh, rh)
    return h_new


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


def _kernel_train(xw_ref, u_ref, b_ref, out_ref, gates_ref, h_scratch):
    """Forward kernel variant for training: also writes (z, r, hh, rh) per
    step so the backward never re-runs the recurrence."""
    t = pl.program_id(0)
    D, B, H = h_scratch.shape

    @pl.when(t == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    for d in range(D):
        h = h_scratch[d]  # (B, H) f32
        rec = jnp.dot(
            h.astype(u_ref.dtype),
            u_ref[d],
            preferred_element_type=jnp.float32,
        )
        rec = rec + b_ref[d][None, :].astype(jnp.float32)
        xw_t = xw_ref[0, d].astype(jnp.float32)
        h_new, (z, r, hh, rh) = _gru_gate_math(
            h, xw_t, rec, H, with_gates=True
        )
        h_scratch[d] = h_new
        out_ref[0, d] = h_new.astype(out_ref.dtype)
        gates_ref[0, d] = jnp.concatenate([z, r, hh, rh], axis=-1)


def bigru_pallas_train(xw, u, rec_bias, interpret=False):
    """Forward + gate stash: returns (hs (T,D,B,H), gates (T,D,B,4H) f32)."""
    T, D, B, G = xw.shape
    H = G // 3
    return pl.pallas_call(
        _kernel_train,
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
        out_specs=(
            pl.BlockSpec(
                (1, D, B, H), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, D, B, 4 * H), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, D, B, H), xw.dtype),
            jax.ShapeDtypeStruct((T, D, B, 4 * H), jnp.float32),
        ),
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
    """Fused BiGRU recurrence: Pallas forward, analytic scan backward."""
    return bigru_pallas_raw(xw, u, rec_bias, interpret=interpret)


def _fwd(xw, u, rec_bias, interpret):
    hs, gates = bigru_pallas_train(xw, u, rec_bias, interpret=interpret)
    return hs, (u, hs, gates)


def _bwd(interpret, residuals, g):
    """Analytic GRU backward from stashed gates (see module docstring).

    Per step (both directions at once; dir 1's time axis is pre-reversed
    everywhere, so one reverse scan serves both):
      dh    = dh_carry + g_t
      da_z  = dh (h_prev - hh) z (1-z)
      da_h  = dh (1-z) (1-hh^2)
      da_r  = da_h rh r (1-r)
      drec  = [da_z, da_r, da_h r]      (cotangent of h_prev @ U + b)
      dxw_t = [da_z, da_r, da_h]
      dh_prev = dh z + drec @ U^T
    dU and db hoist out of the scan: dU = sum_t h_prev^T drec,
    db = sum_{t,b} drec.
    """
    u, hs, gates = residuals
    T, D, B, H = hs.shape

    h_prev_seq = jnp.concatenate(
        [jnp.zeros((1, D, B, H), hs.dtype), hs[:-1]], axis=0
    ).astype(jnp.float32)

    def step(dh, inp):
        g_t, gates_t, h_prev = inp
        z = gates_t[..., :H]
        r = gates_t[..., H : 2 * H]
        hh = gates_t[..., 2 * H : 3 * H]
        rh = gates_t[..., 3 * H :]
        dh = dh + g_t.astype(jnp.float32)
        da_z = dh * (h_prev - hh) * z * (1.0 - z)
        da_h = dh * (1.0 - z) * (1.0 - hh * hh)
        da_r = da_h * rh * r * (1.0 - r)
        drec = jnp.concatenate([da_z, da_r, da_h * r], axis=-1)
        dh_prev = dh * z + jnp.einsum(
            "dbg,dhg->dbh", drec, u.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        dxw_t = jnp.concatenate([da_z, da_r, da_h], axis=-1)
        return dh_prev, (dxw_t, drec)

    dh0 = jnp.zeros((D, B, H), jnp.float32)
    _, (dxw, drec_seq) = jax.lax.scan(
        step, dh0, (g, gates, h_prev_seq), reverse=True
    )
    du = jnp.einsum(
        "tdbh,tdbg->dhg", h_prev_seq, drec_seq,
        preferred_element_type=jnp.float32,
    ).astype(u.dtype)
    # rec_bias reaches the primal as f32 regardless of compute dtype
    # (models/rnn.py casts it explicitly), so its cotangent stays f32
    db = jnp.sum(drec_seq, axis=(0, 2))
    return dxw.astype(hs.dtype), du, db


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


def _lstm_gate_math(h, c, xw_t, rec, H, with_gates=False):
    gates = xw_t + rec
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    if with_gates:
        return h_new, c_new, (i, f, g, o)
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


def _lstm_kernel_train(xw_ref, u_ref, out_ref, gates_ref, h_scratch,
                       c_scratch):
    """LSTM forward that also writes (i, f, g, o, c) per step for the
    analytic backward."""
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
        )
        xw_t = xw_ref[0, d].astype(jnp.float32)
        h_new, c_new, (i, f, g, o) = _lstm_gate_math(
            h, c, xw_t, rec, H, with_gates=True
        )
        h_scratch[d] = h_new
        c_scratch[d] = c_new
        out_ref[0, d] = h_new.astype(out_ref.dtype)
        gates_ref[0, d] = jnp.concatenate([i, f, g, o, c_new], axis=-1)


def bilstm_pallas_train(xw, u, interpret=False):
    """Forward + stash: returns (hs (T,D,B,H), gates (T,D,B,5H) f32)."""
    T, D, B, G = xw.shape
    H = G // 4
    return pl.pallas_call(
        _lstm_kernel_train,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, D, B, G), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((D, H, G), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, D, B, H), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, D, B, 5 * H), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, D, B, H), xw.dtype),
            jax.ShapeDtypeStruct((T, D, B, 5 * H), jnp.float32),
        ),
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
    """Fused BiLSTM recurrence: Pallas forward, analytic scan backward."""
    return bilstm_pallas_raw(xw, u, interpret=interpret)


def _lstm_fwd(xw, u, interpret):
    hs, gates = bilstm_pallas_train(xw, u, interpret=interpret)
    return hs, (u, hs, gates)


def _lstm_bwd(interpret, residuals, g):
    """Analytic LSTM backward from stashed (i, f, g, o, c).

    gates = xw + h_prev @ U, so dxw_t == drec per step; dU/db hoist out of
    the reverse scan exactly like the GRU case.
    """
    u, hs, gates = residuals
    T, D, B, H = hs.shape

    c_seq = gates[..., 4 * H :]
    c_prev_seq = jnp.concatenate(
        [jnp.zeros((1, D, B, H), jnp.float32), c_seq[:-1]], axis=0
    )
    h_prev_seq = jnp.concatenate(
        [jnp.zeros((1, D, B, H), hs.dtype), hs[:-1]], axis=0
    ).astype(jnp.float32)

    def step(carry, inp):
        dh, dc = carry
        g_t, gates_t, c_prev = inp
        i = gates_t[..., :H]
        f = gates_t[..., H : 2 * H]
        gg = gates_t[..., 2 * H : 3 * H]
        o = gates_t[..., 3 * H : 4 * H]
        c = gates_t[..., 4 * H :]
        tc = jnp.tanh(c)
        dh = dh + g_t.astype(jnp.float32)
        da_o = dh * tc * o * (1.0 - o)
        dc = dc + dh * o * (1.0 - tc * tc)
        da_f = dc * c_prev * f * (1.0 - f)
        da_i = dc * gg * i * (1.0 - i)
        da_c = dc * i * (1.0 - gg * gg)
        drec = jnp.concatenate([da_i, da_f, da_c, da_o], axis=-1)
        dh_prev = jnp.einsum(
            "dbg,dhg->dbh", drec, u.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        dc_prev = dc * f
        return (dh_prev, dc_prev), drec

    zero = jnp.zeros((D, B, H), jnp.float32)
    _, drec_seq = jax.lax.scan(
        step, (zero, zero), (g, gates, c_prev_seq), reverse=True
    )
    du = jnp.einsum(
        "tdbh,tdbg->dhg", h_prev_seq, drec_seq,
        preferred_element_type=jnp.float32,
    ).astype(u.dtype)
    return drec_seq.astype(hs.dtype), du


bilstm_fused.defvjp(_lstm_fwd, _lstm_bwd)
