"""On-device TF-exact CTC beam search (reference C13, SURVEY.md §7.5).

The reference decodes via ``K.ctc_decode(greedy=False)`` -> TF's C++
``CTCBeamSearchDecoderOp``, whose per-step candidate insertion is
*sequential with in-step mutation* (see ops/ctc_beam_exact.py for the
behavioral spec, reverse-engineered by differential testing against the
installed tf_keras 2.21 oracle). That sequentiality looks hostile to a TPU,
but it decomposes exactly into vectorized passes:

  1. **Streaming insertion == top-W.** TF inserts each candidate iff it
     strictly beats the current bottom, evicting it. That streaming process
     over an ordered candidate list yields exactly the top-W of
     {stays} ∪ {candidates}, with ties resolved by priority order
     (incumbent stays in score order first, then candidates in
     (branch-rank, label) order) — the first-occurrence tie-break of a
     stable sort / ``lax.top_k``.

  2. **Evicted stays never re-insert.** When a stay (a current beam whose
     prefix equals branch i + label l) is evicted mid-step and branch i
     later regenerates it, the fresh candidate carries only the
     parent-route mass f <= its stay score s. Eviction happened at
     bottom == s and the bottom is non-decreasing, so f > bottom is
     impossible: the regeneration is ALWAYS rejected. Its only observable
     effect is the rejection side effect — zeroing that stay's ``oldp``,
     which gates it out of spawning children later in the same step.
     Consequently every (branch, label) pair whose child prefix is a
     carried stay is simply EXCLUDED from the candidate pool.

  3. **Branch gating is a well-founded fixpoint.** Branch i spawns
     children only if its previous total beats the bottom *at sweep i*
     (or the beam is underfull), and only if it wasn't gate-zeroed by an
     earlier sweep (point 2). Both depend only on sweeps < i, so a
     Jacobi iteration over the W gates converges to the unique sequential
     answer in <= W rounds (typically 1 compute + 1 confirm: gating
     engages only on near-tie posteriors).

Everything else is bookkeeping: prefix identities are rolling hashes
(collision odds ~W^2 * 2^-32 per step), and prefixes are reconstructed
AFTER the scan from per-step backpointers — no (B, W, T) prefix buffer in
the hot loop, which is also why this decoder is *faster* than the previous
vectorized approximate one.

Scoring conventions match ``K.ctc_decode`` exactly: inputs are post-softmax
probabilities, per-frame scores are ``log_softmax(log(p + 1e-7))``, returned
scores are total prefix log-probabilities; dense outputs pad with -1;
adjacent duplicate labels merge in the output (``merge_repeated=True``).

Bit-parity with the host oracle (ops/ctc_beam_exact.py, itself 0-mismatch
fuzzed against tf_keras) is asserted by tests/test_ctc_decode.py and
tools/fuzz_beam_oracle.py --device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

KERAS_EPSILON = 1e-7
NEG = -1e30
HASH_P = jnp.uint32(1000003)
ROOT_SENTINEL = jnp.uint32(0xFFFFFFFF)


def _lse(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m > NEG / 2, out, NEG)


def _beam_step(state, inputs, *, W: int, C: int, force_fast: bool = False):
    """One TF-exact beam step. See module docstring for the derivation."""
    (total, p_b, p_nb, hashes, parent_hash, last_label, length, alive) = state
    lp = inputs  # (B, C) log_softmax(log(p+eps)) for this frame
    B = lp.shape[0]
    blank = C - 1
    iW = jnp.arange(W)

    # ---------------- Phase 1: stay updates (vectorized) ----------------
    # Parent of slot j = alive slot k with hash_k == parent_hash_j and
    # length_k == length_j - 1 (prefix uniqueness -> at most one match).
    pmatch = (
        (hashes[:, None, :] == parent_hash[:, :, None])
        & (length[:, None, :] == length[:, :, None] - 1)
        & alive[:, None, :]
        & alive[:, :, None]
        & (length[:, :, None] > 0)
    )  # (B, j, k)
    parent_found = jnp.any(pmatch, axis=2)  # (B, W)
    parent_idx = jnp.argmax(pmatch, axis=2)  # (B, W)
    par_total = jnp.take_along_axis(total, parent_idx, axis=1)
    par_p_b = jnp.take_along_axis(p_b, parent_idx, axis=1)
    par_label = jnp.take_along_axis(last_label, parent_idx, axis=1)
    prev_route = jnp.where(last_label == par_label, par_p_b, par_total)
    fold = jnp.where(parent_found, prev_route, NEG)

    lp_label = jnp.take_along_axis(
        lp, jnp.maximum(last_label, 0), axis=1
    )  # (B, W); root's -1 clamped but unused
    has_label = length > 0
    new_p_nb = jnp.where(
        has_label, _lse(p_nb, fold) + lp_label, p_nb
    )
    new_p_b = total + lp[:, blank][:, None]
    stay_total = _lse(new_p_b, new_p_nb)
    stay_total = jnp.where(alive, stay_total, NEG)
    new_p_b = jnp.where(alive, new_p_b, NEG)
    new_p_nb = jnp.where(alive, new_p_nb, NEG)

    # Stable sort of stays (descending): ties keep branch (carried) order,
    # exactly TF's stable re-sort after the stay updates.
    perm = jnp.argsort(-stay_total, axis=1, stable=True)  # (B, W)
    s_total = jnp.take_along_axis(stay_total, perm, axis=1)
    # inverse permutation: sorted position of branch j's stay
    inv_perm = jnp.zeros((B, W), jnp.int32).at[
        jnp.arange(B)[:, None], perm
    ].set(iW[None, :].astype(jnp.int32))

    # ---------------- Phase 2: candidate pool ----------------
    # Candidate (branch i, label l): parent-route mass + emission.
    route = jnp.where(
        jnp.arange(C)[None, None, :] == last_label[:, :, None],
        p_b[:, :, None],
        total[:, :, None],
    )  # (B, W, C)
    cand = route + lp[:, None, :]
    # Child-stay exclusion (point 2 of the docstring): (i, l) whose prefix
    # is a carried stay never enters the pool (active -> folded in phase 1
    # and skipped; evicted -> regeneration always rejected).
    child_of = (
        (parent_hash[:, None, :] == hashes[:, :, None])
        & (length[:, None, :] == length[:, :, None] + 1)
        & alive[:, None, :]
        & alive[:, :, None]
    )  # (B, i, j): stay j is branch i's child
    lab_onehot = (
        jnp.arange(C)[None, None, :] == last_label[:, :, None]
    )  # (B, j, C)
    excl = jnp.einsum(
        "bij,bjc->bic", child_of.astype(jnp.float32),
        lab_onehot.astype(jnp.float32),
    ) > 0.5  # (B, i, C)
    dead_col = jnp.arange(C)[None, None, :] == blank
    cand = jnp.where(excl | dead_col | ~alive[:, :, None], NEG, cand)

    # Pool: [sorted stays (W), candidates (W*C, (branch, label) order)].
    # (A per-branch top-(W+1) prefilter is provably lossless but measured
    # SLOWER on v5e — many small top_k/argsort rows lower worse than one
    # wide top_k — so the pool stays full-width.)
    N = W + W * C
    pool = jnp.concatenate([s_total, cand.reshape(B, W * C)], axis=1)
    eligible = alive & (total > NEG / 2)

    # -------- Fast path: all gates open == one top-(W+1) --------
    # Gating/zeroing is rare (it engages only on near-tie posteriors), and
    # there is a cheap PROOF of when the all-open answer is exact:
    #   * all-open pool is a superset of the truly-gated pool, and all-open
    #     bottoms upper-bound the sequential bottoms, so
    #     total_prev_i > bottom_final  =>  branch i's gate truly open;
    #   * a stay still in the all-open top-W was never evicted, so its
    #     branch cannot have been gate-zeroed;
    #   * a strict value gap at the W boundary means dropping any gated-off
    #     (necessarily unselected) candidate cannot change the selection.
    # When every selected candidate's branch passes all three, the all-open
    # top-W IS the sequential result; otherwise take the exact slow path.
    topv1, topi1 = jax.lax.top_k(pool, W + 1)
    bottom_final = topv1[:, W - 1]  # (B,)
    sel_idx = topi1[:, :W]
    sel_is_cand = sel_idx >= W
    sel_branch = jnp.clip((sel_idx - W) // C, 0, W - 1)
    # branches owning >= 1 selected candidate
    bsel = jnp.any(
        sel_is_cand[:, :, None]
        & (sel_branch[:, :, None] == iW[None, None, :]),
        axis=1,
    )  # (B, W)
    stay_in_top = jnp.any(
        (~sel_is_cand[:, :, None])
        & (sel_idx[:, :, None] == inv_perm[:, None, :]),
        axis=1,
    )  # (B, W): branch j's stay survived
    ok_a = jnp.all(~bsel | (total > bottom_final[:, None]), axis=1)
    safe_zero = stay_in_top | ~parent_found | (parent_idx >= iW[None, :])
    ok_b = jnp.all(~bsel | safe_zero, axis=1)
    ok_c = (topv1[:, W - 1] > topv1[:, W]) | (topv1[:, W] <= NEG / 2)
    fast_ok = jnp.all(ok_a & ok_b & ok_c)

    def fast_path(_):
        return topv1[:, :W], topi1[:, :W]

    # -------- Slow path: exact sequential gating (fixpoint) --------
    # (A pool shrink to stays + top-K candidates was tried and REVERTED:
    # candidates <= the worst stay are provably irrelevant, but any static
    # cap on the rest can undercount m4's eviction priors — a dropped
    # entry's in-branch beaters need not precede kappa_j — flipping the
    # zeroing cascade on adversarial near-ties. Exactness wins.)
    def slow_path(_):
        pool_idx_sorted = jnp.argsort(-pool, axis=1, stable=True)  # (B, N)
        vals_sorted = jnp.take_along_axis(pool, pool_idx_sorted, axis=1)
        finite_sorted = vals_sorted > NEG / 2
        is_cand_sorted = pool_idx_sorted >= W
        origin_sorted = jnp.where(
            is_cand_sorted, (pool_idx_sorted - W) // C, W
        )  # branch rank; stays -> W (sentinel slot in open_ext)
        key_sorted = jnp.where(
            is_cand_sorted, pool_idx_sorted - W, -1
        )  # candidate order key i*C + l; stays -> -1 (before everything)
        # sorted position of each stay's pool entry (pool idx = inv_perm[j])
        rank_of_pool = jnp.zeros((B, N), jnp.int32).at[
            jnp.arange(B)[:, None], pool_idx_sorted
        ].set(jnp.arange(N, dtype=jnp.int32)[None, :])
        pos_stay_j = jnp.take_along_axis(rank_of_pool, inv_perm, axis=1)

        kappa = parent_idx * C + jnp.maximum(last_label, 0)  # regen key

        def fix_body(carry):
            open_, zeroed, _, it = carry
            open_ext = jnp.concatenate(
                [open_, jnp.ones((B, 1), bool)], axis=1
            )  # stays always included
            inc = finite_sorted & jnp.take_along_axis(
                open_ext, origin_sorted, axis=1
            )  # (B, N)

            # bottom before sweep i: W-th best of {stays, open cands < i}
            thresh = (iW * C)[None, :, None]  # (1, W, 1)
            m3 = inc[:, None, :] & (key_sorted[:, None, :] < thresh)
            cums = jnp.cumsum(m3.astype(jnp.int32), axis=2)
            count = cums[:, :, -1]  # (B, W)
            hit = jnp.argmax(cums >= W, axis=2)  # first pos reaching W
            bottom = jnp.take_along_axis(
                vals_sorted[:, None, :].repeat(W, 1), hit[:, :, None],
                axis=2,
            )[:, :, 0]
            bottom = jnp.where(count >= W, bottom, NEG)
            open_new = (
                eligible
                & ~zeroed
                & ((count < W) | (total > bottom))
            )

            # gate-zeroing: stay j evicted before its parent's regen
            # attempt at key kappa_j, parent rank < j, parent gate open.
            m4 = inc[:, None, :] & (
                key_sorted[:, None, :] < kappa[:, :, None]
            )  # (B, j, N)
            cum4 = jnp.cumsum(m4.astype(jnp.int32), axis=2)
            prior = jnp.where(
                pos_stay_j > 0,
                jnp.take_along_axis(
                    cum4, jnp.maximum(pos_stay_j - 1, 0)[:, :, None],
                    axis=2,
                )[:, :, 0],
                0,
            )  # higher-priority entries with key < kappa_j
            evicted_before = prior >= W
            par_open = jnp.take_along_axis(
                jnp.concatenate([open_, jnp.zeros((B, 1), bool)], axis=1),
                jnp.where(parent_found, parent_idx, W),
                axis=1,
            )
            zeroed_new = (
                alive
                & parent_found
                & (parent_idx < iW[None, :])
                & par_open
                & evicted_before
            )
            changed = jnp.any(open_new != open_) | jnp.any(
                zeroed_new != zeroed
            )
            return open_new, zeroed_new, changed, it + 1

        def fix_cond(carry):
            _, _, changed, it = carry
            return changed & (it < W + 2)

        init = (eligible, jnp.zeros((B, W), bool), jnp.array(True), 0)
        open_, zeroed, _, _ = jax.lax.while_loop(fix_cond, fix_body, init)

        open_bc = jnp.repeat(open_, C, axis=1)  # (B, W*C) candidate gate
        pool_masked = jnp.concatenate(
            [s_total, jnp.where(open_bc, cand.reshape(B, W * C), NEG)],
            axis=1,
        )
        tv, ti = jax.lax.top_k(pool_masked, W)  # ties: lowest index
        return tv, ti

    if force_fast:  # debug/benchmark knob: skip the exactness fallback
        top_vals, top_idx = fast_path(None)
    else:
        top_vals, top_idx = jax.lax.cond(
            fast_ok, fast_path, slow_path, None
        )

    is_stay = top_idx < W
    stay_branch = jnp.take_along_axis(
        perm, jnp.minimum(top_idx, W - 1), axis=1
    )
    cand_branch = jnp.clip((top_idx - W) // C, 0, W - 1)
    cand_label = (top_idx - W) % C
    src = jnp.where(is_stay, stay_branch, cand_branch)  # carried slot

    gather = lambda a: jnp.take_along_axis(a, src, axis=1)
    n_total = top_vals
    n_p_b = jnp.where(is_stay, gather(new_p_b), NEG)
    n_p_nb = jnp.where(is_stay, gather(new_p_nb), top_vals)
    n_hash = jnp.where(
        is_stay,
        gather(hashes),
        gather(hashes) * HASH_P + (cand_label + 1).astype(jnp.uint32),
    )
    n_parent_hash = jnp.where(is_stay, gather(parent_hash), gather(hashes))
    n_last_label = jnp.where(is_stay, gather(last_label), cand_label)
    n_length = jnp.where(is_stay, gather(length), gather(length) + 1)
    n_alive = top_vals > NEG / 2
    bp_src = src.astype(jnp.int32)
    bp_label = jnp.where(is_stay | ~n_alive, -1, cand_label).astype(jnp.int32)

    return (
        (n_total, n_p_b, n_p_nb, n_hash, n_parent_hash, n_last_label,
         n_length, n_alive),
        (bp_src, bp_label),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "top_paths", "merge_repeated", "_force_fast"
    ),
)
def ctc_beam_search_decode_tf(
    y_pred: jnp.ndarray,
    input_length: jnp.ndarray,
    beam_width: int = 10,
    top_paths: int = 1,
    merge_repeated: bool = True,
    _force_fast: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TF-exact batched beam search, fully on-device.

    Args:
      y_pred: (B, T, C) post-softmax probabilities; blank = C-1.
      input_length: (B,) valid frame counts.

    Returns:
      decoded: (top_paths, B, T) int32, -1 padded (adjacent duplicates
        merged when ``merge_repeated``).
      log_probs: (B, top_paths) float32 total prefix log-probabilities
        (-inf for collapsed-beam padding paths, like the host oracle).
    """
    if top_paths > beam_width:
        raise ValueError(
            f"top_paths ({top_paths}) must be <= beam_width ({beam_width})"
        )
    B, T, C = y_pred.shape
    W = beam_width
    lp_all = jax.nn.log_softmax(
        jnp.log(y_pred.astype(jnp.float32) + KERAS_EPSILON), axis=-1
    )
    input_length = input_length.astype(jnp.int32).reshape(B)

    # Initial beam: root (empty prefix) alone.
    total0 = jnp.full((B, W), NEG).at[:, 0].set(0.0)
    p_b0 = jnp.full((B, W), NEG).at[:, 0].set(0.0)
    p_nb0 = jnp.full((B, W), NEG)
    hash0 = jnp.zeros((B, W), jnp.uint32)
    parent_hash0 = jnp.full((B, W), ROOT_SENTINEL)
    last_label0 = jnp.full((B, W), -1, jnp.int32)
    length0 = jnp.zeros((B, W), jnp.int32)
    alive0 = jnp.zeros((B, W), bool).at[:, 0].set(True)

    def step(state, inp):
        lp, t = inp
        new_state, (bp_src, bp_label) = _beam_step(
            state, lp, W=W, C=C, force_fast=_force_fast
        )
        frozen = (t >= input_length)[:, None]  # (B, 1)
        out_state = tuple(
            jnp.where(frozen, old, new)
            for old, new in zip(state, new_state)
        )
        bp_src = jnp.where(frozen, jnp.arange(W, dtype=jnp.int32)[None, :],
                           bp_src)
        bp_label = jnp.where(frozen, -1, bp_label)
        return out_state, (bp_src, bp_label)

    state0 = (total0, p_b0, p_nb0, hash0, parent_hash0, last_label0,
              length0, alive0)
    ts = jnp.arange(T, dtype=jnp.int32)
    (total, _, _, _, _, _, _, alive), (bps, bpl) = jax.lax.scan(
        step, state0, (jnp.transpose(lp_all, (1, 0, 2)), ts)
    )

    # Final beam is maintained in TF's final order (desc, stable) already.
    P = top_paths
    sel = jnp.arange(P, dtype=jnp.int32)[None, :].repeat(B, 0)  # (B, P)
    scores = jnp.take_along_axis(total, sel, axis=1)
    alive_sel = jnp.take_along_axis(alive, sel, axis=1)
    scores = jnp.where(alive_sel, scores, -jnp.inf)

    # Reconstruct prefixes from backpointers (reverse walk).
    def back(carry, bp):
        cur = carry  # (B, P) current slot
        bp_src_t, bp_label_t = bp
        lab = jnp.take_along_axis(bp_label_t, cur, axis=1)
        nxt = jnp.take_along_axis(bp_src_t, cur, axis=1)
        return nxt, lab

    _, labs_rev = jax.lax.scan(back, sel, (bps, bpl), reverse=True)
    labs = labs_rev  # (T, B, P), time-forward emission order
    labs = jnp.transpose(labs, (1, 2, 0)).reshape(B * P, T)
    labs = jnp.where(alive_sel.reshape(B * P, 1), labs, -1)

    keep = labs != -1
    if merge_repeated:
        from crnn_ocr_tpu.ops.ctc import _pack_left

        packed, _ = _pack_left(labs, keep, -1)
        prev = jnp.concatenate(
            [jnp.full((B * P, 1), -2, jnp.int32), packed[:, :-1]], axis=1
        )
        keep2 = (packed != -1) & (packed != prev)
        merged, _ = _pack_left(packed, keep2, -1)
    else:
        from crnn_ocr_tpu.ops.ctc import _pack_left

        merged, _ = _pack_left(labs, keep, -1)

    decoded = jnp.transpose(merged.reshape(B, P, T), (1, 0, 2))
    return decoded, scores
