"""Pallas CTC forward-backward (reference C12's math, fully on-chip).

The lax.scan CTC in ops/ctc.py is correct and golden-tested; this kernel
pair is its performance twin for the training hot path (BASELINE.json names
"CTC loss forward-backward" as a Pallas target):

  * forward: grid=(T,), alpha (S, B) carried in VMEM scratch (S on sublanes,
    B on the 128-lane axis), per-step emission blocks streamed by the Pallas
    pipeline; all alphas written out for the backward pass.
  * backward: grid=(T,) with a REVERSED index map, beta carried in scratch,
    gradient emitted analytically per step:
        dL/demit[t,s] = -exp(alpha[t,s] + beta[t,s] - log p_total)
    (beta excludes the emission at t), instead of autodiffing the scan —
    one fused kernel, no transposed-scan scatter chain.
  * custom_vjp stitches them; the (B,T,S)->(B,T,C) emission-to-class
    scatter stays outside (one scatter-add, XLA-native).

Numerics match ops.ctc.ctc_forward_log_loss (same masking/freezing rules);
equality of values AND gradients is unit-tested in interpret mode and the
wrapper is cross-checked against the tf_keras goldens via the shared
ctc_batch_cost entry point when CRNN_OCR_CTC_PALLAS=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m > NEG / 2, out, NEG)


def _shift_down(x, k):
    """Shift rows down by k along axis 0 (S), filling with NEG."""
    S = x.shape[0]
    pad = jnp.full((k,) + x.shape[1:], NEG, x.dtype)
    return jnp.concatenate([pad, x[: S - k]], axis=0)


def _shift_up(x, k):
    S = x.shape[0]
    pad = jnp.full((k,) + x.shape[1:], NEG, x.dtype)
    return jnp.concatenate([x[k:], pad], axis=0)


CHUNK = 8  # timesteps per grid step (amortizes per-step grid overhead)


def _fwd_kernel(emits_ref, skip_ref, valid_ref, len_ref, alphas_ref, scratch):
    g = pl.program_id(0)
    valid = valid_ref[...] > 0  # (S, B)
    skip = skip_ref[...] > 0

    def body(i, _):
        t = g * CHUNK + i
        emit = emits_ref[i]  # (S, B)

        @pl.when(t == 0)
        def _():
            # init: positions 0 (and 1 when a label exists) = emit.
            init = jnp.where(valid_ref[...] > 1, emit, NEG)
            scratch[...] = init
            alphas_ref[i] = init

        @pl.when(t > 0)
        def _():
            alpha = scratch[...]
            s1 = _shift_down(alpha, 1)
            s2 = jnp.where(skip, _shift_down(alpha, 2), NEG)
            new = _lse3(alpha, s1, s2) + emit
            new = jnp.where(valid, new, NEG)
            new = jnp.where(jnp.float32(t) < len_ref[...], new, alpha)
            scratch[...] = new
            alphas_ref[i] = new

        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def _bwd_kernel(
    emits_ref, skip_ref, valid_ref, len_ref, endmask_ref, betas_ref, scratch
):
    # Grid blocks arrive in REVERSE time order via the index maps; within a
    # block we iterate timesteps high->low. beta[t] excludes emit at t.
    g_rev = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(g_rev == 0)
    def _():
        scratch[...] = jnp.full_like(scratch, NEG)

    valid = valid_ref[...] > 0
    skip_up2 = _shift_up(skip_ref[...], 2) > 0
    lens = len_ref[...]

    def body(i_rev, _):
        i = (CHUNK - 1) - i_rev  # within-block index, high -> low
        t_abs = ((n - 1) - g_rev) * CHUNK + i
        # Seed end positions at each sample's last active frame.
        beta = scratch[...]
        is_last_active = (jnp.float32(t_abs) == lens - 1.0)
        beta = jnp.where(is_last_active & (endmask_ref[...] > 0), 0.0, beta)
        betas_ref[i] = beta

        # beta[t-1,s] = lse(beta[t,s]+e[t,s], beta[t,s+1]+e[t,s+1],
        #                   skip[s+2] ? beta[t,s+2]+e[t,s+2])
        emit = emits_ref[i]
        b_e = jnp.where(valid, beta + emit, NEG)
        up1 = _shift_up(b_e, 1)
        up2 = jnp.where(skip_up2, _shift_up(b_e, 2), NEG)
        new_beta = _lse3(b_e, up1, up2)
        # frames at/after len: beta passes through unchanged (frozen).
        active_prev = (jnp.float32(t_abs) <= lens - 1.0)
        scratch[...] = jnp.where(active_prev, new_beta, beta)
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def _prep(log_probs, labels, input_length, label_length):
    B, T, C = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    blank = C - 1
    labels = jnp.clip(labels.astype(jnp.int32), 0, C - 1)
    input_length = input_length.astype(jnp.int32).reshape(B)
    label_length = label_length.astype(jnp.int32).reshape(B)

    ext = jnp.full((B, S), blank, jnp.int32)
    ext = ext.at[:, 1::2].set(labels)
    ext_m2 = jnp.concatenate(
        [jnp.full((B, 2), -1, jnp.int32), ext[:, :-2]], axis=1
    )
    allow_skip = (ext != blank) & (ext != ext_m2)

    s_idx = jnp.arange(S)[None, :]
    valid_s = s_idx < (2 * label_length[:, None] + 1)
    init2 = s_idx < jnp.where(label_length[:, None] > 0, 2, 1)
    # valid codes: 0 invalid, 1 valid, 2 valid+init position
    valid_code = valid_s.astype(jnp.float32) + init2.astype(jnp.float32)

    endmask = (
        (s_idx == 2 * label_length[:, None])
        | (
            (s_idx == 2 * label_length[:, None] - 1)
            & (label_length[:, None] > 0)
        )
    ).astype(jnp.float32)

    # Emission gather as a one-hot matmul: XLA's gather lowers to a slow
    # scalar loop on TPU (measured 1.2 ms/step at B=128 — dominating the
    # whole kernel), while selection via the MXU is ~free at these sizes.
    # Precision.HIGHEST keeps the f32 values exact (no bf16 truncation);
    # each output element is one selected addend, so the matmul IS a gather.
    onehot = (
        ext[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)  # (B, S, C)
    emits = jnp.einsum(
        "btc,bsc->bts", log_probs.astype(jnp.float32), onehot,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, T, S)
    # (T, S, B) layout: B on lanes, S on sublanes
    emits_t = jnp.transpose(emits, (1, 2, 0))
    skip = jnp.transpose(allow_skip, (1, 0)).astype(jnp.float32)  # (S, B)
    valid = jnp.transpose(valid_code, (1, 0))  # (S, B)
    lens = jnp.broadcast_to(
        input_length.astype(jnp.float32)[None, :], (S, B)
    )
    endm = jnp.transpose(endmask, (1, 0))  # (S, B)
    return emits_t, skip, valid, lens, endm, ext, label_length


def _pad_T(x):
    T = x.shape[0]
    T_pad = -(-T // CHUNK) * CHUNK
    if T_pad == T:
        return x
    pad = jnp.zeros((T_pad - T,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _run_fwd(emits_t, skip, valid, lens, interpret):
    emits_t = _pad_T(emits_t)
    T_pad, S, B = emits_t.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(T_pad // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, S, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, S, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(emits_t, skip, valid, lens)


def _run_bwd(emits_t, skip, valid, lens, endm, interpret):
    emits_t = _pad_T(emits_t)
    T_pad, S, B = emits_t.shape
    nblk = T_pad // CHUNK
    rev = lambda t: (nblk - 1 - t, 0, 0)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((CHUNK, S, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, S, B), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(emits_t, skip, valid, lens, endm)


def _loss_from_alphas(alphas, lens, label_length):
    """-logsumexp of the two end positions at the last active frame."""
    T, S, B = alphas.shape
    alpha_T = alphas[T - 1]  # (S, B) — frozen past input_length (incl. pad)
    idx_last = 2 * label_length  # (B,)
    idx_prev = jnp.maximum(2 * label_length - 1, 0)
    a_last = jnp.take_along_axis(alpha_T, idx_last[None, :], axis=0)[0]
    a_prev = jnp.take_along_axis(alpha_T, idx_prev[None, :], axis=0)[0]
    a_prev = jnp.where(label_length > 0, a_prev, NEG)
    m = jnp.maximum(a_last, a_prev)
    m_safe = jnp.maximum(m, NEG)
    tot = m_safe + jnp.log(jnp.exp(a_last - m_safe) + jnp.exp(a_prev - m_safe))
    tot = jnp.where(m > NEG / 2, tot, NEG)
    return -tot  # (B,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss_pallas(log_probs, labels, input_length, label_length,
                    interpret=False):
    """(B,) CTC loss from normalized log-probs; blank = C-1. Pallas fwd/bwd."""
    loss, _ = _fwd_impl(log_probs, labels, input_length, label_length,
                        interpret)
    return loss


def _fwd_impl(log_probs, labels, input_length, label_length, interpret):
    T = log_probs.shape[1]
    prep = _prep(log_probs, labels, input_length, label_length)
    emits_t, skip, valid, lens, endm, ext, lab_len = prep
    alphas = _run_fwd(emits_t, skip, valid, lens, interpret)
    loss = _loss_from_alphas(alphas, lens, lab_len)
    res = (prep, alphas, loss, T, log_probs.shape[-1])
    return loss, res


def _fwd_rule(log_probs, labels, input_length, label_length, interpret):
    return _fwd_impl(log_probs, labels, input_length, label_length, interpret)


def _bwd_rule(interpret, res, g):
    prep, alphas, loss, T, C = res
    emits_t, skip, valid, lens, endm, ext, lab_len = prep
    B = ext.shape[0]
    betas = _run_bwd(emits_t, skip, valid, lens, endm, interpret)
    log_total = -loss  # (B,), loss = -log p_total
    # occupancy gamma[t,s,b]; dL/demit = -exp(gamma - log_total)
    gamma = alphas[:T] + betas[:T]  # (T, S, B) — drop CHUNK padding
    grad_emit = -jnp.exp(
        jnp.minimum(gamma - log_total[None, None, :], 0.0)
    )
    # CTC-infeasible samples (label needs more frames than input_length)
    # have alpha finite but beta=NEG at every position, so gamma-log_total
    # degenerates to NEG-NEG=0 and the clamp above would emit -1 per
    # position. The scan path's autodiff produces exact zeros there; match
    # it by zeroing wherever the occupancy or the total likelihood is dead.
    feasible = (gamma > NEG / 2) & (log_total[None, None, :] > NEG / 2)
    grad_emit = jnp.where(feasible, grad_emit, 0.0)
    # zero out frozen frames and invalid positions
    t_idx = jnp.arange(T)[:, None, None].astype(jnp.float32)
    grad_emit = jnp.where(t_idx < lens[None, :, :], grad_emit, 0.0)
    grad_emit = jnp.where(valid[None] > 0, grad_emit, 0.0)
    # Chain rule to log_probs: the (B,T,S)->(B,T,C) scatter-add over ext
    # classes as a one-hot matmul (XLA scatter is a serial loop on TPU —
    # measured 0.8 ms/step at B=128; the MXU sums duplicate classes for
    # free, exactly, under Precision.HIGHEST).
    grad_emit_btS = jnp.transpose(grad_emit, (2, 0, 1))  # (B, T, S)
    onehot = (
        ext[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)  # (B, S, C)
    grad_lp = jnp.einsum(
        "bts,bsc->btc", grad_emit_btS, onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    grad_lp = grad_lp * g[:, None, None]
    return (grad_lp, None, None, None)


ctc_loss_pallas.defvjp(_fwd_rule, _bwd_rule)


def ctc_supported(B: int, S: int) -> bool:
    """Lane/sublane tiling gate (B on lanes)."""
    return B % 128 == 0
