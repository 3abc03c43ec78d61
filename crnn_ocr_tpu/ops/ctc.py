"""On-device CTC loss and decoders (TPU-native, JAX/XLA).

This module is the TPU-native replacement for the reference's delegated CTC
core (SURVEY.md §2.2 C12/C13):

  * reference call path: ``K.ctc_batch_cost`` (tf_keras/src/backend.py:7143)
    -> ``tf.compat.v1.nn.ctc_loss`` (tensorflow/python/ops/ctc_ops.py:73)
    -> C++ ``CTCLossOp`` — a CPU kernel, i.e. the reference pays a
    device->host copy of the softmax every training step.
  * reference decode path: ``K.ctc_decode`` (backend.py:7181) ->
    ``ctc_greedy_decoder`` / ``ctc_beam_search_decoder`` (ctc_ops.py:299/:382),
    also CPU kernels.

Here everything runs on-device as batched, statically-shaped XLA programs:
the forward-backward recursion is a ``lax.scan`` over time (sequential by
nature, O(T) steps of fully-vectorized (B, S) work), decoders are
``argmax``/top-k + scan. No host round-trip.

Semantics replicated exactly (validated by golden tests vs the locally
installed tf_keras 2.21 oracle, see tests/test_ctc_*.py):

  * ``ctc_batch_cost``: inputs are post-softmax probabilities; Keras takes
    ``log(y_pred + 1e-7)`` (Keras epsilon) and TF's ctc_loss re-applies a
    log-softmax internally; blank index = num_classes - 1; dense labels with
    explicit ``label_length``; repeated labels require an interposed blank
    (ctc_merge_repeated=True, the Graves 2006 recursion).
  * greedy decode: per-frame argmax over ``log(y_pred + eps)`` for
    ``t < input_length``, collapse adjacent repeats, drop blanks; the score is
    the **negative sum of per-frame max logits** (TF returns ``neg_sum_logits``,
    no renormalization); dense output padded with -1.
  * beam decode: see :func:`ctc_beam_search_decode`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Keras backend epsilon (tf_keras/src/backend_config.py): used by
# ctc_batch_cost / ctc_decode when taking log of probabilities.
KERAS_EPSILON = 1e-7

_NEG_INF = -1e30  # large-negative stand-in for -inf; keeps grads NaN-free


def _logsumexp3(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """logsumexp over three stacked arrays, safe when all are ~ -inf."""
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, _NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m > _NEG_INF / 2, out, _NEG_INF)


def ctc_forward_log_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_length: jnp.ndarray,
    label_length: jnp.ndarray,
    blank: int,
) -> jnp.ndarray:
    """Negative log-likelihood via the CTC alpha recursion (Graves 2006).

    Args:
      log_probs: (B, T, C) per-frame log-probabilities (already normalized).
      labels: (B, L) dense int labels (padding values beyond ``label_length``
        are ignored; they cannot contaminate the result because alpha mass at
        extended positions > 2*label_length never flows back).
      input_length: (B,) valid frame counts.
      label_length: (B,) valid label counts.
      blank: blank class index.

    Returns:
      (B,) float32 loss = -log p(labels | log_probs).
    """
    B, T, C = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    labels = jnp.clip(labels.astype(jnp.int32), 0, C - 1)
    input_length = input_length.astype(jnp.int32).reshape(B)
    label_length = label_length.astype(jnp.int32).reshape(B)

    # Extended label sequence: blank, l1, blank, l2, ..., blank  -> (B, S)
    ext = jnp.full((B, S), blank, dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(labels)

    # Skip transition s-2 -> s allowed iff ext[s] is a real label differing
    # from ext[s-2].
    ext_m2 = jnp.concatenate(
        [jnp.full((B, 2), -1, jnp.int32), ext[:, :-2]], axis=1
    )
    allow_skip = (ext != blank) & (ext != ext_m2)  # (B, S)

    s_idx = jnp.arange(S)[None, :]  # (1, S)
    valid_s = s_idx < (2 * label_length[:, None] + 1)  # (B, S)

    # Hoist ALL emission gathers out of the scan: one batched gather
    # (B, T, S) instead of T in-scan gathers (and one scatter-add in the
    # backward instead of T) — ~25% faster CTC fwd+bwd on v5e.
    emits = jnp.take_along_axis(
        log_probs, ext[:, None, :].repeat(T, axis=1), axis=2
    )  # (B, T, S)
    emits_tmajor = jnp.transpose(emits, (1, 0, 2))  # (T, B, S)

    # t = 0 init: alpha[0] = lp[blank], alpha[1] = lp[l1]
    init_mask = s_idx < jnp.where(label_length[:, None] > 0, 2, 1)
    alpha0 = jnp.where(init_mask & valid_s, emits_tmajor[0], _NEG_INF)

    def step(alpha, emit_and_t):
        emit, t = emit_and_t  # (B, S)
        shift1 = jnp.concatenate(
            [jnp.full((B, 1), _NEG_INF, alpha.dtype), alpha[:, :-1]], axis=1
        )
        shift2 = jnp.concatenate(
            [jnp.full((B, 2), _NEG_INF, alpha.dtype), alpha[:, :-2]], axis=1
        )
        shift2 = jnp.where(allow_skip, shift2, _NEG_INF)
        new = _logsumexp3(alpha, shift1, shift2) + emit
        new = jnp.where(valid_s, new, _NEG_INF)
        # Frames past input_length leave alpha untouched.
        new = jnp.where((t < input_length)[:, None], new, alpha)
        return new, None

    ts = jnp.arange(1, T)
    alpha_T, _ = jax.lax.scan(step, alpha0, (emits_tmajor[1:], ts))

    # Loss = -logsumexp(alpha[2*label_len], alpha[2*label_len - 1]).
    idx_last = 2 * label_length  # final blank position
    idx_prev = jnp.maximum(2 * label_length - 1, 0)  # final label position
    a_last = jnp.take_along_axis(alpha_T, idx_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(alpha_T, idx_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_length > 0, a_prev, _NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    m_safe = jnp.maximum(m, _NEG_INF)
    total = m_safe + jnp.log(jnp.exp(a_last - m_safe) + jnp.exp(a_prev - m_safe))
    total = jnp.where(m > _NEG_INF / 2, total, _NEG_INF)
    return -total


def ctc_batch_cost(
    labels: jnp.ndarray,
    y_pred: jnp.ndarray,
    input_length: jnp.ndarray,
    label_length: jnp.ndarray,
) -> jnp.ndarray:
    """Drop-in equivalent of ``K.ctc_batch_cost`` (tf_keras backend.py:7143).

    Args:
      labels: (B, L) dense int labels.
      y_pred: (B, T, C) post-softmax probabilities; blank = C-1.
      input_length: (B, 1) or (B,) valid frame counts.
      label_length: (B, 1) or (B,) valid label counts.

    Returns:
      (B, 1) float32 per-sample CTC loss.
    """
    B, T, C = y_pred.shape
    # Keras: log(y_pred + eps); TF ctc_loss then log-softmaxes the "logits".
    logits = jnp.log(y_pred.astype(jnp.float32) + KERAS_EPSILON)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = ctc_forward_log_loss(
        log_probs,
        labels,
        jnp.reshape(input_length, (B,)),
        jnp.reshape(label_length, (B,)),
        blank=C - 1,
    )
    return loss[:, None]


def ctc_loss_from_log_probs(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_length: jnp.ndarray,
    label_length: jnp.ndarray,
) -> jnp.ndarray:
    """CTC loss on already-normalized log-probs (training hot path).

    The training step keeps everything in log-space (no exp->log round trip
    through a softmax layer); blank = C-1 as everywhere in this framework.
    Returns (B,) loss.
    """
    C = log_probs.shape[-1]
    return ctc_forward_log_loss(
        log_probs, labels, input_length, label_length, blank=C - 1
    )


# ---------------------------------------------------------------------------
# Greedy decoding
# ---------------------------------------------------------------------------


def _pack_left(values: jnp.ndarray, keep: jnp.ndarray, pad_value: int):
    """Left-pack kept elements of each row, pad tail with ``pad_value``.

    Scatter-based: destination index = exclusive cumsum of the keep mask
    (dropped elements all collide on one dump slot). Statically shaped, and
    ~5x cheaper on TPU than the stable-argsort formulation (sort dominates
    decode cost at serving batch sizes — measured on v5e).
    """
    B, T = values.shape
    counts = jnp.sum(keep, axis=-1)
    pos = jnp.cumsum(keep, axis=-1) - 1  # destination when kept
    dest = jnp.where(keep, pos, T)  # dropped -> dump slot T
    out = jnp.full((B, T + 1), pad_value, values.dtype)
    out = out.at[jnp.arange(B)[:, None], dest].set(
        values, mode="drop", unique_indices=False
    )
    return out[:, :T], counts


@functools.partial(jax.jit, static_argnames=("merge_repeated",))
def ctc_greedy_decode(
    y_pred: jnp.ndarray,
    input_length: jnp.ndarray,
    merge_repeated: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy CTC decode matching ``K.ctc_decode(..., greedy=True)``.

    TF semantics (ctc_ops.py:299): argmax per frame over the raw inputs
    (which Keras passes as ``log(y_pred + eps)``), only frames
    ``t < input_length`` participate, adjacent repeats merge, blanks
    (= C-1) drop; the returned score is ``neg_sum_logits``: minus the sum of
    per-frame max logits over valid frames. Dense output pads with -1.

    Returns:
      decoded: (B, T) int32, -1 padded.
      neg_sum_logits: (B, 1) float32.
    """
    B, T, C = y_pred.shape
    blank = C - 1
    logits = jnp.log(y_pred.astype(jnp.float32) + KERAS_EPSILON)
    input_length = input_length.astype(jnp.int32).reshape(B)

    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    maxval = jnp.max(logits, axis=-1)  # (B, T)

    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < input_length[:, None]

    neg_sum = -jnp.sum(jnp.where(valid, maxval, 0.0), axis=-1, keepdims=True)

    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), best[:, :-1]], 1)
    keep = valid & (best != blank)
    if merge_repeated:
        # A frame is kept only if it differs from the previous *valid* frame.
        # Frames are contiguous from t=0, so previous frame is t-1.
        keep = keep & ((best != prev) | (t_idx == 0))
    decoded, _ = _pack_left(best, keep, -1)
    return decoded, neg_sum


@jax.jit
def ctc_greedy_alignment(
    y_pred: jnp.ndarray, input_length: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-character time alignment of the greedy path (beyond-reference:
    the reference exposes decoded text only; OCR consumers routinely need
    WHERE each character sits — e.g. to crop fields or overlay boxes).

    For each character that ``ctc_greedy_decode`` (merge_repeated=True)
    emits, reports the frame extent of its argmax RUN — the maximal block
    of consecutive valid frames sharing that argmax label — and the peak
    softmax probability inside the run (the usual per-char confidence).
    The run is a nominal localization (the conv receptive field blurs
    edges), but it is the standard CTC segmentation and is exact about
    which frames voted for the character.

    All on-device: one argmax + boundary cumsum + two per-row segment
    reductions; statically shaped (segments keyed by frame index).

    Args:
      y_pred: (B, T, C) post-softmax probabilities, blank = C-1 (same
        contract as ``ctc_greedy_decode``).
      input_length: (B,) valid frame counts.

    Returns (labels, starts, ends, confs), all (B, T), left-packed to match
    ``ctc_greedy_decode``'s emitted sequence exactly (asserted by tests):
      labels: int32 class ids, -1 padded.
      starts/ends: int32 first/last frame of the run (inclusive), -1 padded.
      confs: float32 max probability over the run, 0 padded.
    """
    B, T, C = y_pred.shape
    blank = C - 1
    y_pred = y_pred.astype(jnp.float32)
    input_length = input_length.astype(jnp.int32).reshape(B)

    best = jnp.argmax(y_pred, axis=-1).astype(jnp.int32)  # (B, T)
    pmax = jnp.max(y_pred, axis=-1)  # (B, T)
    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < input_length[:, None]

    # Invalid frames must never extend a valid run (TF greedy stops at
    # input_length): give them an impossible label so they break segments.
    best_eff = jnp.where(valid, best, -2)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -3, jnp.int32), best_eff[:, :-1]], 1
    )
    newrun = best_eff != prev  # (B, T); frame 0 always True (-3 sentinel)
    seg_id = jnp.cumsum(newrun.astype(jnp.int32), axis=-1) - 1  # in [0, T)

    def per_row(seg, frames, conf):
        seg_end = jax.ops.segment_max(frames, seg, num_segments=T)
        seg_conf = jax.ops.segment_max(conf, seg, num_segments=T)
        return seg_end[seg], seg_conf[seg]

    run_end, run_conf = jax.vmap(per_row)(
        seg_id, jnp.broadcast_to(t_idx, (B, T)), pmax
    )

    keep = valid & (best != blank) & newrun  # one emission per run
    labels, _ = _pack_left(best, keep, -1)
    starts, _ = _pack_left(jnp.broadcast_to(t_idx, (B, T)), keep, -1)
    ends, _ = _pack_left(run_end, keep, -1)
    confs, _ = _pack_left(run_conf, keep, jnp.float32(0.0))
    return labels, starts, ends, confs


@jax.jit
def ctc_forced_alignment(
    y_pred: jnp.ndarray,
    input_length: jnp.ndarray,
    labels: jnp.ndarray,
    label_length: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Constrained (forced) Viterbi alignment of a GIVEN label sequence
    (beyond-reference; the decode-agnostic sibling of
    :func:`ctc_greedy_alignment` — works for beam output, ground truth,
    any label sequence, not just the argmax path).

    Runs the max-product version of the CTC recursion over the
    blank-interleaved state sequence (blank, l1, blank, ..., lL, blank):
    ``delta[t, s] = emit[t, s] + max(delta[t-1, s], delta[t-1, s-1],
    delta[t-1, s-2] if skip allowed)`` — one ``lax.scan`` forward with
    backpointers, one reversed scan to extract the state path, then
    per-label segment reductions. All on-device, statically shaped.

    Args:
      y_pred: (B, T, C) post-softmax probabilities, blank = C-1 (same
        contract as ``ctc_greedy_decode``).
      input_length: (B,) valid frame counts.
      labels: (B, L) dense int labels (values beyond ``label_length``
        ignored).
      label_length: (B,) valid label counts (may be 0: all pads).

    Returns (starts, ends, confs, feasible):
      starts/ends: (B, L) int32 first/last frame (inclusive) the Viterbi
        path spends in each label's emitting state, -1 beyond
        ``label_length`` (and everywhere when infeasible).
      confs: (B, L) float32 peak probability of the label inside its span
        (same convention as ``ctc_greedy_alignment``), 0 padded.
      feasible: (B,) bool — False when no valid path exists (e.g.
        ``input_length`` too short for the labels' required blanks), in
        which case that row's spans are all -1.
    """
    B, T, C = y_pred.shape
    L = labels.shape[1]
    S = 2 * L + 1
    blank = C - 1
    y_pred = y_pred.astype(jnp.float32)
    logp = jnp.log(y_pred + KERAS_EPSILON)
    input_length = input_length.astype(jnp.int32).reshape(B)
    label_length = label_length.astype(jnp.int32).reshape(B)
    labels = jnp.clip(labels.astype(jnp.int32), 0, C - 1)

    # Extended states: blank, l1, blank, l2, ..., blank.
    ext = jnp.full((B, S), blank, jnp.int32)
    ext = ext.at[:, 1::2].set(labels)
    ext_m2 = jnp.concatenate(
        [jnp.full((B, 2), -1, jnp.int32), ext[:, :-2]], axis=1
    )
    allow_skip = (ext != blank) & (ext != ext_m2)  # (B, S)
    s_idx = jnp.arange(S)[None, :]
    valid_s = s_idx < (2 * label_length[:, None] + 1)

    emits = jnp.take_along_axis(
        logp, ext[:, None, :].repeat(T, axis=1), axis=2
    )  # (B, T, S)
    emits_tmajor = jnp.transpose(emits, (1, 0, 2))  # (T, B, S)

    init_mask = s_idx < jnp.where(label_length[:, None] > 0, 2, 1)
    delta0 = jnp.where(init_mask & valid_s, emits_tmajor[0], _NEG_INF)

    def fwd(delta, emit_and_t):
        emit, t = emit_and_t
        shift1 = jnp.concatenate(
            [jnp.full((B, 1), _NEG_INF, delta.dtype), delta[:, :-1]], axis=1
        )
        shift2 = jnp.concatenate(
            [jnp.full((B, 2), _NEG_INF, delta.dtype), delta[:, :-2]], axis=1
        )
        shift2 = jnp.where(allow_skip, shift2, _NEG_INF)
        # Backpointer = how many states we stepped (0/1/2); ties prefer
        # the smaller step (stay > diagonal > skip), a fixed deterministic
        # rule matching the numpy reference in tests.
        best = jnp.maximum(jnp.maximum(delta, shift1), shift2)
        bp = jnp.where(
            delta >= best, 0, jnp.where(shift1 >= best, 1, 2)
        ).astype(jnp.int8)
        new = jnp.where(valid_s, best + emit, _NEG_INF)
        active = (t < input_length)[:, None]
        new = jnp.where(active, new, delta)
        bp = jnp.where(active, bp, jnp.int8(0))
        return new, bp

    ts = jnp.arange(1, T)
    delta_T, bps = jax.lax.scan(fwd, delta0, (emits_tmajor[1:], ts))
    # bps: (T-1, B, S) backpointers for transitions into frames 1..T-1.
    bps = jnp.concatenate(
        [jnp.zeros((1, B, S), jnp.int8), bps], axis=0
    )  # frame 0 has no incoming transition

    # End state: best of final blank (2*len) vs final label (2*len - 1).
    idx_last = 2 * label_length
    idx_prev = jnp.maximum(2 * label_length - 1, 0)
    d_last = jnp.take_along_axis(delta_T, idx_last[:, None], axis=1)[:, 0]
    d_prev = jnp.take_along_axis(delta_T, idx_prev[:, None], axis=1)[:, 0]
    d_prev = jnp.where(label_length > 0, d_prev, _NEG_INF)
    end_state = jnp.where(d_prev > d_last, idx_prev, idx_last)
    feasible = jnp.maximum(d_last, d_prev) > _NEG_INF / 2

    # Backtrace: reversed scan carrying the current state; at each frame t
    # the carried state IS the path state (seeded at t = input_len - 1).
    def back(cur, t):
        cur = jnp.where(t == input_length - 1, end_state, cur)
        step_back = jnp.take_along_axis(bps[t], cur[:, None], axis=1)[:, 0]
        prev = jnp.where(t > 0, cur - step_back.astype(jnp.int32), cur)
        return prev, cur

    _, states_rev = jax.lax.scan(
        back, end_state, jnp.arange(T - 1, -1, -1)
    )
    states = jnp.flip(states_rev.T, axis=1)  # (B, T) path state per frame

    t_idx = jnp.arange(T)[None, :]
    valid_t = t_idx < input_length[:, None]
    # Map each frame to its label position: odd states s -> (s-1)//2,
    # blanks / invalid frames -> dump slot L.
    is_label = (states % 2 == 1) & valid_t & feasible[:, None]
    pos = jnp.where(is_label, (states - 1) // 2, L)  # (B, T)

    # Per-frame probability of the visited state's label (for confs).
    p_state = jnp.take_along_axis(
        y_pred,
        jnp.take_along_axis(
            ext, jnp.clip(states, 0, S - 1), axis=1
        )[..., None],
        axis=2,
    )[..., 0]  # (B, T)

    def per_row(pos_r, frames, p_r):
        starts = -jax.ops.segment_max(
            -frames, pos_r, num_segments=L + 1
        )  # segment_min
        ends = jax.ops.segment_max(frames, pos_r, num_segments=L + 1)
        confs = jax.ops.segment_max(p_r, pos_r, num_segments=L + 1)
        return starts[:L], ends[:L], confs[:L]

    frames_b = jnp.broadcast_to(t_idx, (B, T))
    starts, ends, confs = jax.vmap(per_row)(pos, frames_b, p_state)

    # segment_max over an empty segment returns the dtype min; any label
    # position with no frame (possible only when infeasible or beyond
    # label_length) pads with -1/0.
    has = jax.vmap(
        lambda p: jax.ops.segment_sum(jnp.ones_like(p), p, num_segments=L + 1)[
            :L
        ]
    )(pos) > 0
    l_idx = jnp.arange(L)[None, :]
    keep = has & (l_idx < label_length[:, None]) & feasible[:, None]
    starts = jnp.where(keep, starts, -1).astype(jnp.int32)
    ends = jnp.where(keep, ends, -1).astype(jnp.int32)
    confs = jnp.where(keep, confs, 0.0).astype(jnp.float32)
    return starts, ends, confs, feasible


# ---------------------------------------------------------------------------
# Beam-search decoding
# ---------------------------------------------------------------------------


def ctc_beam_search_decode(
    y_pred: jnp.ndarray,
    input_length: jnp.ndarray,
    beam_width: int = 10,
    top_paths: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device CTC prefix beam search (textbook/admissible).

    NOTE: superseded as the default by the TF-exact decoder in
    :mod:`crnn_ocr_tpu.ops.ctc_beam_device` (``ctc_decode`` routes there).
    This vectorized search is kept as the *admissible* variant: it never
    returns a lower-probability path than TF's (TF's sequential in-step
    eviction loses mass on near-tie inputs), making it the better scorer
    when TF-compat is not required.

    Approximates ``K.ctc_decode(..., greedy=False)`` -> TF
    ``ctc_beam_search_decoder`` (ctc_ops.py:382) with its defaults
    (``merge_repeated=True`` at the TF level is a no-op for the returned
    top paths because prefix beam search already merges into prefixes).

    TF's C++ decoder normalizes the input "logits" with a log-softmax before
    scoring; Keras feeds ``log(y_pred + eps)`` so the effective per-frame
    scores are ``log_softmax(log(y_pred + eps))``. Scores returned are the
    total log-probability of each prefix (sum over blank/non-blank endings).

    Implementation: fixed-width prefix beam search as a ``lax.scan`` over
    time. Beam state is a (B, W, T) prefix buffer plus (B, W) log-probs split
    into blank-ending / non-blank-ending mass. Each step expands W beams by
    (1 + K) candidates (stay + top-K symbol extensions), merges duplicates
    (extension by the prefix's own last symbol after a blank vs. not), and
    re-selects the top W.

    For exact parity with TF's scorer (including tie-breaking) we expand with
    *all* C-1 symbols rather than a pruned top-K: at OCR alphabet sizes
    (C ~ 80-100) the (B, W, C) expansion is a small fully-vectorized block
    that XLA handles easily.

    Returns:
      decoded: (top_paths, B, T) int32, -1 padded.
      log_probs: (B, top_paths) float32 total prefix log-probabilities.
    """
    if top_paths > beam_width:
        # TF raises the same way ("requested more paths than the beam width")
        raise ValueError(
            f"top_paths ({top_paths}) must be <= beam_width ({beam_width})"
        )
    B, T, C = y_pred.shape
    blank = C - 1
    W = beam_width
    logits = jnp.log(y_pred.astype(jnp.float32) + KERAS_EPSILON)
    log_probs = jax.nn.log_softmax(logits, axis=-1)  # (B, T, C)
    input_length = input_length.astype(jnp.int32).reshape(B)

    NEG = _NEG_INF

    # Beam state:
    #   prefixes: (B, W, T) int32, -1 padded
    #   lengths:  (B, W)
    #   p_b: (B, W) log prob of prefix ending in blank
    #   p_nb: (B, W) log prob of prefix ending in its last symbol
    #   hashes:   (B, W) uint32 rolling prefix hash (h' = h*P + sym + 1),
    #             maintained incrementally so in-step duplicate detection is
    #             O(W^2) scalar compares instead of O(W^2 * T) prefix scans.
    prefixes0 = jnp.full((B, W, T), -1, jnp.int32)
    lengths0 = jnp.zeros((B, W), jnp.int32)
    p_b0 = jnp.full((B, W), NEG).at[:, 0].set(0.0)  # only empty prefix alive
    p_nb0 = jnp.full((B, W), NEG)
    hashes0 = jnp.zeros((B, W), jnp.uint32)
    HASH_P = jnp.uint32(1000003)

    def logaddexp(a, b):
        m = jnp.maximum(a, b)
        m_safe = jnp.maximum(m, NEG)
        out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
        return jnp.where(m > NEG / 2, out, NEG)

    def step(state, inp):
        prefixes, lengths, p_b, p_nb, hashes, t = state
        lp = inp  # (B, C)

        total = logaddexp(p_b, p_nb)  # (B, W)

        lp_blank = lp[:, blank][:, None]  # (B, 1)
        last_sym = jnp.take_along_axis(
            prefixes, jnp.maximum(lengths - 1, 0)[:, :, None], axis=2
        )[:, :, 0]  # (B, W)
        last_sym = jnp.where(lengths > 0, last_sym, -1)

        # --- candidates that KEEP the prefix (no growth) ---
        # end in blank: (p_b + p_nb) * p(blank)
        new_p_b = total + lp_blank
        # repeat last symbol without blank: p_nb * p(last)
        lp_last = jnp.take_along_axis(
            lp, jnp.maximum(last_sym, 0), axis=1
        )  # (B, W)
        new_p_nb_same = jnp.where(lengths > 0, p_nb + lp_last, NEG)

        # --- candidates that EXTEND the prefix by symbol c (growth) ---
        # extend from blank-ending mass always; from non-blank-ending mass
        # only when c != last symbol.
        lp_sym = lp[:, None, :]  # (B, 1, C)
        ext_from_b = p_b[:, :, None] + lp_sym  # (B, W, C)
        c_idx = jnp.arange(C)[None, None, :]
        not_same = c_idx != last_sym[:, :, None]
        ext_from_nb = jnp.where(not_same, p_nb[:, :, None] + lp_sym, NEG)
        ext_p_nb = logaddexp(ext_from_b, ext_from_nb)  # (B, W, C)
        # blank cannot extend
        ext_p_nb = ext_p_nb.at[:, :, blank].set(NEG)

        # Merge duplicate candidates. Within one step, two kinds of duplicates
        # arise: (a) extending beam i by c may equal extending beam j by c'
        # (only if prefixes collide — TF handles via hashmap; with W small and
        # prefixes unique by construction of previous merge, the only
        # in-step collision is (a') extending beam i by its own last symbol
        # [via blank] colliding with beam j that already equals that longer
        # prefix and "stays". We merge exactly that case below by folding
        # grown candidates into existing equal beams.
        #
        # Strategy: candidate set = W "stay" candidates (same prefixes,
        # updated p_b/p_nb) + W*C "grow" candidates. For each grow candidate
        # equal to an existing stay candidate, fold its mass into the stay
        # candidate's p_nb and kill the grow candidate.

        # Detect grow candidate (i, c) == stay candidate j via rolling
        # hashes (prefix_j == prefix_i + [last_sym_j] <=> hash_j ==
        # hash_i*P + last_sym_j + 1 and len_j == len_i + 1, up to 2^-32
        # collision odds). No T-length prefix scans.
        tgt = hashes[:, :, None] * HASH_P + (
            (last_sym + 1).astype(jnp.uint32)
        )[:, None, :]  # (B, W_i, W_j): hash beam i would get by adding sym_j
        child = (
            (tgt == hashes[:, None, :])
            & (lengths[:, None, :] == lengths[:, :, None] + 1)
            & (lengths[:, None, :] > 0)
        )  # (B, W_i, W_j)

        # Fold: for each (i, c) grown candidate that equals stay beam j,
        # add its mass into stay j's p_nb and remove from grow set.
        sym_j = jnp.broadcast_to(
            jnp.maximum(last_sym, 0)[:, None, :], (B, W, W)
        )
        grow_mass_to_j = jnp.where(
            child,
            jnp.take_along_axis(ext_p_nb, sym_j, axis=2),
            NEG,
        )  # (B, W_i, W_j): mass from beam i extending into beam j
        # total fold into j: logsumexp over i
        fold_max = jnp.max(grow_mass_to_j, axis=1)  # (B, W)
        fold_sum = jnp.sum(
            jnp.exp(grow_mass_to_j - jnp.maximum(fold_max, NEG)[:, None, :]),
            axis=1,
        )
        fold = jnp.where(
            fold_max > NEG / 2,
            fold_max + jnp.log(fold_sum),
            NEG,
        )  # (B, W)
        new_p_nb_same = logaddexp(new_p_nb_same, fold)

        # Kill folded grow candidates: (i, c) is killed iff exists j with
        # child[i, j] and last_sym_j == c.
        kill = jnp.any(
            child[:, :, :, None]
            & (
                last_sym[:, None, :, None]
                == jnp.arange(C)[None, None, None, :]
            ),
            axis=2,
        )  # (B, W, C)
        ext_p_nb = jnp.where(kill, NEG, ext_p_nb)

        # --- assemble candidate pool ---
        # stay candidates: W entries, score = logaddexp(new_p_b, new_p_nb_same)
        stay_total = logaddexp(new_p_b, new_p_nb_same)
        # grow candidates: W*C entries, p_b = NEG, p_nb = ext_p_nb
        grow_total = ext_p_nb.reshape(B, W * C)

        all_total = jnp.concatenate([stay_total, grow_total], axis=1)
        # Deterministic tie-break: prefer earlier candidate index (stay
        # beams first, then grow by (beam, symbol)) — matches TF's stable
        # ordering of equal-score beams closely enough for goldens; exact
        # tie cases are differential-tested.
        topk_val, topk_idx = jax.lax.top_k(all_total, W)

        is_stay = topk_idx < W
        src_beam = jnp.where(is_stay, topk_idx, (topk_idx - W) // C)
        sym = jnp.where(is_stay, -1, (topk_idx - W) % C)

        sel_prefix = jnp.take_along_axis(
            prefixes, src_beam[:, :, None], axis=1
        )  # (B, W, T)
        sel_len = jnp.take_along_axis(lengths, src_beam, axis=1)
        # append symbol for grow candidates
        app_pos = jnp.minimum(sel_len, T - 1)
        appended = jnp.where(
            (jnp.arange(T)[None, None, :] == app_pos[:, :, None])
            & (~is_stay)[:, :, None],
            sym[:, :, None],
            sel_prefix,
        )
        new_prefixes = appended
        new_lengths = jnp.where(is_stay, sel_len, sel_len + 1)

        sel_p_b = jnp.where(
            is_stay, jnp.take_along_axis(new_p_b, src_beam, axis=1), NEG
        )
        stay_p_nb = jnp.take_along_axis(new_p_nb_same, src_beam, axis=1)
        grow_p_nb = jnp.take_along_axis(
            ext_p_nb.reshape(B, W * C),
            jnp.clip(topk_idx - W, 0, W * C - 1),
            axis=1,
        )
        sel_p_nb = jnp.where(is_stay, stay_p_nb, grow_p_nb)
        sel_hash = jnp.take_along_axis(hashes, src_beam, axis=1)
        new_hashes = jnp.where(
            is_stay,
            sel_hash,
            sel_hash * HASH_P + (sym + 1).astype(jnp.uint32),
        )

        # Frames past input_length: state frozen.
        active = (t < input_length)[:, None]
        new_prefixes = jnp.where(active[:, :, None], new_prefixes, prefixes)
        new_lengths = jnp.where(active, new_lengths, lengths)
        sel_p_b = jnp.where(active, sel_p_b, p_b)
        sel_p_nb = jnp.where(active, sel_p_nb, p_nb)
        new_hashes = jnp.where(active, new_hashes, hashes)

        return (
            new_prefixes,
            new_lengths,
            sel_p_b,
            sel_p_nb,
            new_hashes,
            t + 1,
        ), None

    state0 = (prefixes0, lengths0, p_b0, p_nb0, hashes0, jnp.int32(0))
    (prefixes, lengths, p_b, p_nb, _, _), _ = jax.lax.scan(
        step, state0, jnp.transpose(log_probs, (1, 0, 2))
    )

    total = jnp.logaddexp(p_b, p_nb)
    # top_paths best beams
    order = jnp.argsort(-total, axis=1, stable=True)[:, :top_paths]
    out_prefix = jnp.take_along_axis(
        prefixes, order[:, :, None], axis=1
    )  # (B, P, T)
    out_scores = jnp.take_along_axis(total, order, axis=1)  # (B, P)

    # TF's ctc_beam_search_decoder default merge_repeated=True collapses
    # ADJACENT duplicate labels at emission time (a decode-output transform;
    # the search itself still distinguishes the prefixes and the scores are
    # unchanged). K.ctc_decode uses this default.
    P = top_paths
    flat = out_prefix.reshape(B * P, T)
    prev = jnp.concatenate(
        [jnp.full((B * P, 1), -2, jnp.int32), flat[:, :-1]], axis=1
    )
    keep = (flat != -1) & (flat != prev)
    merged, _ = _pack_left(flat, keep, -1)
    out_prefix = merged.reshape(B, P, T)

    decoded = jnp.transpose(out_prefix, (1, 0, 2))  # (P, B, T)
    return decoded, out_scores


def ctc_decode(
    y_pred: jnp.ndarray,
    input_length: jnp.ndarray,
    greedy: bool = True,
    beam_width: int = 10,
    top_paths: int = 1,
    merge_repeated: bool = True,
):
    """Drop-in equivalent of ``K.ctc_decode`` (tf_keras backend.py:7181).

    Beam decoding uses the on-device TF-exact decoder
    (:mod:`crnn_ocr_tpu.ops.ctc_beam_device`), which replicates TF's
    sequential-eviction semantics bit-for-bit on the oracle fuzz
    distributions (see that module's docstring for the derivation).

    ``merge_repeated=True`` (the default) matches ``K.ctc_decode`` exactly:
    the Keras backend routes beam decoding through the **V1**
    ``tf.compat.v1.nn.ctc_beam_search_decoder`` (backend.py:7222), whose
    default merges repeated output labels even across blanks — collapsing
    legitimate double letters ("door" -> "dor"). ``merge_repeated=False``
    is the standard CTC beam search (what TF2's
    ``tf.nn.ctc_beam_search_decoder`` does); the search and scores are
    identical in both modes — TF merges only at output extraction.
    See benchmarks/beam_value_eval.json for the measured accuracy gap.

    Returns ``(decoded_list, log_prob)`` where ``decoded_list`` is a list of
    ``top_paths`` dense (B, T) int32 arrays padded with -1 (greedy always
    returns one), and ``log_prob`` is (B, top_paths) (greedy: (B, 1)
    neg_sum_logits).
    """
    if greedy:
        decoded, score = ctc_greedy_decode(y_pred, input_length)
        return [decoded], score
    from crnn_ocr_tpu.ops.ctc_beam_device import ctc_beam_search_decode_tf

    decoded, scores = ctc_beam_search_decode_tf(
        y_pred, input_length, beam_width=beam_width, top_paths=top_paths,
        merge_repeated=merge_repeated,
    )
    return [decoded[p] for p in range(top_paths)], scores


def trim_dense(decoded) -> "list[list[int]]":
    """Strip -1 padding: dense (B, T) -> list of python label lists."""
    import numpy as np

    decoded = np.asarray(decoded)
    return [[int(v) for v in row if v != -1] for row in decoded]
