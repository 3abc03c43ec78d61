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

  3. **Branch gating resolves in one left-to-right pass.** Branch i
     spawns children only if its previous total beats the bottom *at
     sweep i* (or the beam is underfull), and only if it wasn't
     gate-zeroed by an earlier sweep (point 2). Both depend only on
     sweeps < i (well-founded), so an unrolled W-sweep loop carrying a
     running top-W value buffer (bottom = its last lane) plus direct
     eviction counts off small (B, W, W[, C]) compare-reduces computes
     the exact sequential gates — no pool sort, no (B, N) count curves.
     (A Jacobi fixpoint over the gates was the first formulation; it
     converged, but on peaked deployment posteriors it ran its full W+2
     iteration budget nearly every frame — 19x slower per frame,
     measured on v5e. The sorted-pool inclusion-curve formulation that
     replaced it was exact but paid two (B, 820) stable sorts plus
     count-curve einsums per frame — ~2/3 of the slow-branch cost.)

Everything else is bookkeeping: prefix identities are PAIRED independent
32-bit rolling hashes — both must match for a parent/child link, so the
silent-collision odds are ~W^2 * 2^-64 per step per sample (~1e-17 at
W=10, vs ~1.4e-6 per decoded sample for a single 32-bit hash at T~60 —
material for a resident daemon decoding millions of lines; jax's default
x64-disable would silently downcast a uint64 hash, hence the pair), and
prefixes are reconstructed
AFTER the scan from per-step backpointers — no (B, W, T) prefix buffer in
the hot loop, which is also why this decoder is *faster* than the previous
vectorized approximate one.

Dispatch is TIERED per frame: a syntactic safety proof (cheap) admits the
all-open top-W directly; only when it fails does the eviction-bound proof
run, and only when THAT fails does the exact sequential-gating pass run.
Each tier's predicate implies the next tier would agree, so the result is
bit-identical regardless of which tier answers. Every predicate is
per-sample (samples decode independently), so dispatch granularity is a
free parameter (``DISPATCH_BLOCK``); batch-global is the measured default —
per-sub-block cond ladders were built and measured SLOWER in both regimes
because the slow tiers are latency-bound (see the dispatch comment in
``_beam_step``).

Scoring conventions match ``K.ctc_decode`` exactly: inputs are post-softmax
probabilities, per-frame scores are ``log_softmax(log(p + 1e-7))``, returned
scores are total prefix log-probabilities; dense outputs pad with -1;
adjacent duplicate labels merge in the output (``merge_repeated=True``).

Bit-parity with the host oracle (ops/ctc_beam_exact.py, itself 0-mismatch
fuzzed against tf_keras) is asserted by tests/test_ctc_decode.py and
tools/fuzz_beam_oracle.py --device.

Tie scope (r3 prefilter): the per-branch top-(W+1) comes from one shared
top-M of lp plus per-branch patches (see the phase-2 comment). Candidate
VALUES are exact in every case; the LABEL picked among exactly-tied values
can differ from the host oracle only when f32 rounding COLLAPSES two
unequal lp lanes under the +total shift ACROSS the top-M boundary — a
sub-resolution-tie regime where TF's own C++ summation order decides and
neither the old device code nor the host oracle reproduces TF anyway
(measured on 1e-6-jitter degenerate inputs: old 5/64 == new 5/64
agreement with the live tf_keras oracle; on the realistic fuzz
distributions old and new decode 200/200 configs identically).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

KERAS_EPSILON = 1e-7
NEG = -1e30
# np scalars, not jnp: module import must not initialize the JAX backend
# (one TPU grant per host; imports can happen while another process holds it)
HASH_P = np.uint32(1000003)
HASH_P2 = np.uint32(16777619)  # FNV-32 prime; independent second rolling hash
ROOT_SENTINEL = np.uint32(0xFFFFFFFF)
# Tier dispatch granularity: > 0 splits the batch into static blocks of this
# many samples, each with its own lax.cond ladder, so a near-tie sample only
# drags its OWN block into the bound/exact tiers; <= 0 = one batch-global
# ladder. Batch-global is the measured default: the slow tiers are
# latency-bound, so per-block dispatch multiplies slow-path invocations
# unless dirty samples cluster (see the dispatch comment in _beam_step).
DISPATCH_BLOCK = 0


def _lse(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m > NEG / 2, out, NEG)


def _sel1(onehot, vals):
    """Gather-free row lookup: ``vals[b, idx[b, j]]`` as a one-hot
    select-reduce. On v5e a (B, W) ``take_along_axis`` lowers to a custom
    gather kernel with ~3 us of launch overhead per call — at W=10 the
    (B, K, W) select+sum is pure fused vector math and effectively free
    (measured: the gathers + the inv_perm scatter were ~55 of the ~88 us
    per decoded frame at B=32)."""
    return jnp.sum(jnp.where(onehot, vals[:, None, :], 0), axis=2)


# ---------------------------------------------------------------------------
# Tier machinery. Each function takes ``p``: a dict of per-sample tensors
# built by ``_beam_step`` (possibly a DISPATCH_BLOCK slice of the batch —
# samples decode independently, so any block-wise restriction of the batch
# axis is exact). Keys: total, s_total, stay_total, inv_perm,
# cv_b + pool_idx_b (the per-branch top-(W+1) candidate prefilter the
# tiers run on), lp + lp_label + par_total/par_p_b/par_label (the
# decomposed candidate structure — no (B, W, C) cand tensor exists),
# last_label, parent_found, parent_idx, alive, eligible,
# topv1, topi1, cheap_s, cheap_safe, bsel, ok_a, ok_c.
# ---------------------------------------------------------------------------


def _evict_counts(p, W: int, C: int):
    """Shared eviction-count tensors for the bound and exact tiers.

    Every count either tier needs compares candidate values against
    STAY values and is consumed only through the ``>= W`` eviction
    threshold, so the per-branch counts come off the ALREADY-COMPUTED
    top-(W+1) candidate prefilter ``cv_b`` (B, W, K1), not the full
    (B, W, C) pool: ``min(true_count, K1)`` per (j, i) is
    decision-exact, because a capped term equals K1 = W+1 and alone
    forces the summed prior past the threshold, while an uncapped term
    is the true count. (The full-C compare-reduce this replaces was a
    (B, W, W, C) ~21M-element tensor at B=256; the prefilter version is
    C/K1 ~ 7x smaller.) The one count that must be exact UNCAPPED —
    the parent's own pre-regeneration candidates, a SUBSET count whose
    in-branch beaters need not precede kappa_j, so neither capping nor
    the top-M prefilter can bound it — is reconstructed from the
    decomposed candidate structure: a full-C compare on the parent's
    total-route values (lp + par_total, bit-identical to the old
    materialized cand row by f32 commutativity) plus +/-1 corrections
    for the <= W+1 patched lanes (own-label blank-route patch and
    child-stay exclusions).
    """
    iW = jnp.arange(W)
    stay_total, inv_perm = p["stay_total"], p["inv_perm"]
    cv_b = p["cv_b"]  # (B, W, K1) per-branch top-(W+1) candidate values
    sv_j = stay_total[:, :, None]  # (B, j, 1)
    sv_k = stay_total[:, None, :]  # (B, 1, k)
    # Priority = sorted-descending stable pool order: value desc; ties
    # -> stays (in stay sort order) before candidates, so stays count
    # on >=-with-earlier-position and candidates on strict >.
    stays_above = jnp.sum(
        (sv_k > sv_j)
        | ((sv_k == sv_j)
           & (inv_perm[:, None, :] < inv_perm[:, :, None])),
        axis=2, dtype=jnp.int32,
    )  # (B, Wj): stays with higher priority than stay j
    cgt = (
        cv_b[:, None, :, :] > stay_total[:, :, None, None]
    )  # (B, Wj, Wi, K1): branch-i top-K1 candidates above stay j
    above_cnt = jnp.sum(cgt, axis=3, dtype=jnp.int32)  # (B, Wj, Wi) capped
    pj = jnp.where(p["parent_found"], p["parent_idx"], W)  # (B, W)
    pj_onehot = pj[:, :, None] == iW[None, None, :]  # (B, Wj, Wi)
    # The parent's pre-regeneration candidate count is computed off the
    # decomposed candidate structure (no (B, W, C) cand tensor exists any
    # more): parent cand value at label c is lp[c] + par_total, EXCEPT the
    # parent's own last label (blank route only -> par_p_b + lp) and the
    # parent's child-stay exclusions (NEG). Base = full-lane count on the
    # total-route values; the <= W+1 patched lanes are +/-1 corrections.
    # f32 addition is commutative, so lp + par_total here is bit-identical
    # to the old cand's route + lp.
    lab_lt = (
        jnp.arange(C)[None, None, :]
        < jnp.maximum(p["last_label"], 0)[:, :, None]
    )  # (B, Wj, C): labels before branch j's regeneration label
    nonblank = jnp.arange(C)[None, None, :] != (C - 1)
    base = jnp.sum(
        (p["lp"][:, None, :] + p["par_total"][:, :, None] > sv_j)
        & lab_lt & nonblank,
        axis=2, dtype=jnp.int32,
    )  # (B, Wj): total-route parent candidates above stay j, pre-kappa
    # patch lane: the parent's own last label rides the blank route
    par_label = p["par_label"]  # (B, W) label of parent's last emission
    par_lp_lab = _sel1(pj_onehot, p["lp_label"])  # (B, W) lp[par_label]
    kappa = jnp.maximum(p["last_label"], 0)
    patch_in = (par_label < kappa) & (par_label >= 0)
    v_total = p["par_total"] + par_lp_lab
    v_patch = p["par_p_b"] + par_lp_lab
    # is the parent's (par, par_label) extension itself a carried stay?
    child_lab = p["last_label"]  # (B, Wk)
    child_of_par = (
        p["parent_found"][:, None, :]
        & (p["parent_idx"][:, None, :] == pj[:, :, None])
    )  # (B, Wj, Wk): stay k is a child of branch j's parent
    patch_excl = jnp.any(
        child_of_par & (child_lab[:, None, :] == par_label[:, :, None]),
        axis=2,
    )  # (B, Wj)
    corr = jnp.where(
        patch_in,
        -(v_total > stay_total).astype(jnp.int32)
        + jnp.where(patch_excl, 0, (v_patch > stay_total).astype(jnp.int32)),
        0,
    )  # (B, Wj)
    # child-stay exclusions of the parent: each zeroes one counted lane
    excl_sub = jnp.sum(
        child_of_par
        & (child_lab[:, None, :] != par_label[:, :, None])
        & (child_lab[:, None, :] < kappa[:, :, None])
        & (p["lp_label"][:, None, :] + p["par_total"][:, :, None] > sv_j),
        axis=2, dtype=jnp.int32,
    )  # (B, Wj)
    partial_pj = base + corr - excl_sub  # exact, garbage-but-masked when
    #    parent_found is false (pj = W -> par_open/par_notclosed gate it out)
    return stays_above, above_cnt, partial_pj, pj, pj_onehot


def _bound_safe(p, counts, W: int, C: int):
    # The only zeroing hazard for branch j: its stay evicted BEFORE the
    # parent's regeneration attempt at key kappa_j = (pj, label_j).
    # Bound the eviction directly (no sort, no fixpoint): count pool
    # entries with priority above stay_j among {all stays} u
    # {candidates with key < kappa_j}, under ALL-OPEN inclusion (a
    # superset of the true sequential inclusion, so the count is an
    # upper bound; < W => provably never evicted => zeroing impossible
    # => fast path safe for j). A stricter-than-needed stay_in_top test
    # alone rejected ~3% of samples per frame on PEAKED (deployment)
    # posteriors — and the batch-global fast_ok then sank every sample
    # into the sequential fixpoint (28x slower end-to-end, measured).
    iW = jnp.arange(W)
    stays_above, above_cnt, partial_pj, pj, pj_onehot = counts
    s_total, total = p["s_total"], p["total"]
    # Refinement that makes the bound tight on PEAKED (deployment)
    # posteriors: branch 0 has no parent (cannot be zeroed) and is open
    # whenever the beam is underfull or its total beats the worst stay —
    # both checkable directly. When it is provably open, the W-th best
    # of {stays} u {branch-0 candidates} LOWER-bounds the bottom from
    # sweep 1 on (streaming top-W of everything seen; bottom is
    # monotone), so any branch whose total cannot beat that is PROVABLY
    # closed and its candidates never insert — excluded from the
    # eviction count. Without this, phantom candidates of gate-closed
    # weak branches inflate the all-open bound past W and reject ~2-3%
    # of samples per frame.
    n_finite_stays = jnp.sum(s_total > NEG / 2, axis=1)  # (B,)
    bottom_start = s_total[:, W - 1]
    b0_open = p["eligible"][:, 0] & (
        (n_finite_stays < W) | (total[:, 0] > bottom_start)
    )  # (B,)
    # branch 0's contribution to the top-W of the union is within its own
    # top-W, so the per-branch top-(W+1) prefilter is lossless here
    union0 = jnp.concatenate([s_total, p["cv_b"][:, 0, :]], axis=1)
    bottom_lb = jax.lax.top_k(union0, W)[0][:, W - 1]  # (B,)
    notclosed = ~(
        b0_open[:, None]
        & (iW[None, :] >= 1)
        & (total <= bottom_lb[:, None])
    )  # (B, Wi): branches whose candidates may insert
    full = jnp.sum(
        jnp.where(
            (iW[None, None, :] < pj[:, :, None]) & notclosed[:, None, :],
            above_cnt, 0,
        ),
        axis=2,
    )  # (B, Wj): candidates of not-closed branches before the parent
    par_notclosed = jnp.any(pj_onehot & notclosed[:, None, :], axis=2)
    prior = (
        stays_above + full + jnp.where(par_notclosed, partial_pj, 0)
    )
    never_evicted = prior < W
    safe_zero = p["cheap_safe"] | never_evicted
    ok_b = jnp.all(~p["bsel"] | safe_zero, axis=1)
    return p["ok_a"] & ok_b & p["ok_c"]  # (B,) per-sample fast-path safety


def _exact_gates(p, counts, W: int, C: int):
    """Exact sequential gating, ONE left-to-right pass over the W sweeps.

    Gate/zeroing state for sweep j depends only on sweeps < j
    (well-founded), so an unrolled W-sweep loop carrying a running top-W
    value buffer computes the EXACT sequential answer — no Jacobi fixpoint
    (the previous formulation iterated (B,W,N) cumsums up to W+2 times; on
    peaked deployment posteriors it ran the full budget nearly every
    frame, ~19x slower per frame, measured), and no sorted pool /
    inclusion-count curves (replaced by _evict_counts + the top-W merge;
    the sorted-pool machinery was ~6 of the 9.5 ms slow-branch cost per
    decode at B=256, traced on v5e).
    The loop runs entirely on the per-branch top-(W+1) prefilter ``cv_b``:
    the running top-W merge only ever needs each branch's top-W values,
    the underfull counter saturates at W (a K1-capped term alone exceeds
    it), and the eviction priors are decision-exact per _evict_counts'
    capping argument — the one subset count capping can't handle (the
    parent's pre-kappa candidates, whose in-branch beaters need not
    precede kappa_j; an earlier naive pool-shrink attempt was REVERTED
    over exactly that) is counted over the parent's full candidate row
    there. The running top-W buffer takes no counts from the prefilter,
    only bottom VALUES, and the W-th largest included value is exactly
    the sequential bottom.
    """
    iW = jnp.arange(W)
    stays_above, above_cnt, partial_pj, pj, _ = counts
    total, s_total = p["total"], p["s_total"]
    cv_b = p["cv_b"]  # (B, W, K1) per-branch top-(W+1) candidate values
    B = total.shape[0]
    cand_fin = jnp.sum(
        cv_b > NEG / 2, axis=2, dtype=jnp.int32
    )  # (B, Wi): finite candidates per branch, capped at K1 = W+1 — for
    #    the underfull test only: while underfull every finite attempted
    #    candidate inserts, and a capped term alone saturates n_inc past
    #    W, so the n_inc < W decision below is exact
    open_ = jnp.zeros((B, W), bool)
    zeroed_acc = jnp.zeros((B, W), bool)
    # Running top-W VALUES of the included pool (stays + candidates of
    # opened branches so far), descending; bottom = last lane. Value
    # ties need no priority handling here: the W-th largest included
    # value is the bottom regardless of which tied entry holds it.
    R = s_total  # (B, W) sorted stays
    n_inc = jnp.sum(s_total > NEG / 2, axis=1, dtype=jnp.int32)  # (B,)
    for j in range(W):
        # zeroing of branch j: its stay evicted before the parent's
        # regeneration attempt (parent decided in an earlier sweep)
        pj_j = pj[:, j][:, None]  # (B, 1)
        par_open_j = jnp.any(open_ & (iW[None, :] == pj_j), axis=1)
        full_j = jnp.sum(
            jnp.where((iW[None, :] < pj_j) & open_,
                      above_cnt[:, j, :], 0),
            axis=1,
        )  # (B,): candidates of opened branches before the parent
        prior_j = (
            stays_above[:, j]
            + full_j
            + jnp.where(par_open_j, partial_pj[:, j], 0)
        )
        zeroed_j = (
            p["alive"][:, j]
            & p["parent_found"][:, j]
            & (p["parent_idx"][:, j] < j)
            & par_open_j
            & (prior_j >= W)
        )
        open_j = (
            p["eligible"][:, j]
            & ~zeroed_j
            & ((n_inc < W) | (total[:, j] > R[:, W - 1]))
        )
        open_ = jnp.where(iW[None, :] == j, open_j[:, None], open_)
        zeroed_acc = jnp.where(
            iW[None, :] == j, zeroed_j[:, None], zeroed_acc
        )
        n_inc = n_inc + jnp.where(open_j, cand_fin[:, j], 0)
        # merge branch j's candidates into the running top-W: a branch
        # contributes at most W entries to any top-W, so its top-(W+1)
        # prefilter is lossless — one (B, W+K1) top_k per sweep (was
        # (B, W+C); ~5x fewer lanes in the latency-bound sweep chain)
        R = jax.lax.top_k(
            jnp.concatenate(
                [R, jnp.where(open_j[:, None], cv_b[:, j, :], NEG)],
                axis=1,
            ),
            W,
        )[0]
    return open_, zeroed_acc


def _slow_path(p, counts, W: int, C: int):
    iW = jnp.arange(W)
    s_total, cv_b = p["s_total"], p["cv_b"]
    B, _, K1 = cv_b.shape
    open_, _ = _exact_gates(p, counts, W, C)
    # Gated top-W off the per-branch top-(W+1) prefilter: gating drops
    # whole branches, so within-branch priority ranks are unchanged and
    # any gated-pool top-W entry is still inside its branch's top-(W+1).
    cand_r = jnp.where(
        open_[:, :, None], cv_b, NEG
    ).reshape(B, W * K1)  # (B, W*K1) in pool priority order
    # Two-stage top-W with pool-order tie-breaks (ties: lowest pool
    # index, stays before candidates). A direct top_k over the full
    # (B, 820) concat lowered as a FULL stable sort inside this cond
    # branch (1.8 ms/decode at B=256, traced); the reduced pool is
    # (B, 110) and stage 1's (value desc, reduced-index asc) order ==
    # (value desc, (branch, label) asc) because the prefilter is
    # branch-major with label-ascending ties within a branch. Stage 2's
    # concat puts stays first, so equal values resolve to stays, then
    # lower candidate index — identical to the full pool order.
    cv, ci = jax.lax.top_k(cand_r, W)  # (B, W) candidate top-W
    # map reduced positions back to full-pool indices (W + branch*C + label)
    oh_r = ci[:, :, None] == jnp.arange(W * K1)[None, None, :]
    pool_idx_flat = p["pool_idx_b"].reshape(B, W * K1)
    ci_full = jnp.sum(
        jnp.where(oh_r, pool_idx_flat[:, None, :], 0), axis=2
    )  # (B, W)
    tv, mpos = jax.lax.top_k(
        jnp.concatenate([s_total, cv], axis=1), W
    )
    oh = (mpos - W)[:, :, None] == iW[None, None, :]
    cpick = jnp.sum(jnp.where(oh, ci_full[:, None, :], 0), axis=2)
    ti = jnp.where(mpos < W, mpos, cpick)
    return tv, ti


def _tier_dispatch(p, W: int, C: int):
    """Three-tier cond ladder over one batch block: cheap syntactic proof
    -> eviction bound -> exact sequential gating. Bit-identical result
    regardless of which tier answers (each tier's predicate implies the
    next tier would agree)."""

    def fast_path(_):
        return p["topv1"][:, :W], p["topi1"][:, :W]

    def bound_path(_):
        # _evict_counts is computed ONCE here and closed over by the inner
        # cond's slow branch (the counts are identical for both tiers; the
        # slow branch previously recomputed them).
        counts = _evict_counts(p, W, C)
        fast_ok = jnp.all(_bound_safe(p, counts, W, C))
        return jax.lax.cond(
            fast_ok, fast_path, lambda _: _slow_path(p, counts, W, C), None
        )

    return jax.lax.cond(jnp.all(p["cheap_s"]), fast_path, bound_path, None)


def _beam_step(state, inputs, *, W: int, C: int, force_fast: bool = False,
               diag: bool = False):
    """One TF-exact beam step. See module docstring for the derivation.

    With ``diag=True`` the step additionally returns per-sample dispatch
    predicates ``(cheap_s, bound_s)`` — which samples the tier-1 syntactic
    proof and the tier-2 eviction bound would individually admit this
    frame — for tier-hit-rate measurement (tools/diag_beam_tiers.py).
    """
    (total, p_b, p_nb, hashes, hashes2, parent_hash, parent_hash2,
     last_label, length, alive) = state
    lp = inputs  # (B, C) log_softmax(log(p+eps)) for this frame
    B = lp.shape[0]
    blank = C - 1
    iW = jnp.arange(W)

    # ---------------- Phase 1: stay updates (vectorized) ----------------
    # Parent of slot j = alive slot k with hash_k == parent_hash_j (BOTH
    # independent hashes) and length_k == length_j - 1 (prefix uniqueness
    # -> at most one match).
    pmatch = (
        (hashes[:, None, :] == parent_hash[:, :, None])
        & (hashes2[:, None, :] == parent_hash2[:, :, None])
        & (length[:, None, :] == length[:, :, None] - 1)
        & alive[:, None, :]
        & alive[:, :, None]
        & (length[:, :, None] > 0)
    )  # (B, j, k)
    parent_found = jnp.any(pmatch, axis=2)  # (B, W)
    parent_idx = jnp.argmax(pmatch, axis=2)  # (B, W)
    # pmatch has at most one hit per row j -> the masked sums ARE the
    # parent lookups (0 when no parent; fold's where masks that out).
    par_total = _sel1(pmatch, total)
    par_p_b = _sel1(pmatch, p_b)
    par_label = _sel1(pmatch, last_label)
    prev_route = jnp.where(last_label == par_label, par_p_b, par_total)
    fold = jnp.where(parent_found, prev_route, NEG)

    lab_onehot = (
        jnp.arange(C)[None, None, :] == last_label[:, :, None]
    )  # (B, j, C); all-false for the root's -1 (lp_label unused there)
    lp_label = _sel1(lab_onehot, lp)  # (B, W)
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
    # exactly TF's stable re-sort after the stay updates. Multi-operand
    # lax.sort co-sorts the branch ids (perm) for free; the inverse
    # permutation comes from comparison COUNTING, not a scatter (the
    # .at[].set scatter was a 21 us/frame custom kernel on v5e).
    neg_s, perm = jax.lax.sort(
        (-stay_total,
         jnp.broadcast_to(iW[None, :].astype(jnp.int32), (B, W))),
        dimension=1, num_keys=1, is_stable=True,
    )
    s_total = -neg_s
    sv_j = stay_total[:, :, None]  # (B, j, 1)
    sv_k = stay_total[:, None, :]  # (B, 1, k)
    inv_perm = jnp.sum(
        (sv_k > sv_j) | ((sv_k == sv_j) & (iW[None, None, :] < iW[None, :, None])),
        axis=2,
    ).astype(jnp.int32)  # (B, W): sorted position of branch j's stay

    # ---------------- Phase 2: candidate pool ----------------
    # Candidate (branch i, label l): parent-route mass + emission —
    # cand[i, l] = total_i + lp[l] for every label EXCEPT (a) branch i's
    # own last label (blank route only: p_b_i + lp), (b) child-stay
    # exclusions (point 2 of the docstring: (i, l) whose prefix is a
    # carried stay never enters the pool), (c) blank, (d) dead branches.
    # So the candidate matrix is a rank-1 structure (one shared lp row +
    # per-branch offsets) with at most W+1 patched lanes per branch — the
    # (B, W, C) cand tensor is never materialized. Per-branch top-(W+1)
    # comes from ONE shared top-M of lp (M = K1 + W + 1 non-blank lanes:
    # masking removes <= 1 own-label + <= W child lanes per branch, so
    # >= K1 shared lanes always survive) plus the patch lane, re-sorted by
    # (value desc, label asc) — the shift by total_i can COLLAPSE distinct
    # lp values into f32 ties, where TF's pool order demands label-
    # ascending, so a 2-key lax.sort over the M+1 lanes (not a positional
    # top_k) restores exact tie order. (This replaced a (B*W, C) top_k
    # over a materialized cand — 81-lane sort, ~8% of decode leaf time —
    # plus the (B, W, C) cand fusion itself, ~15%, traced on v5e.)
    eligible = alive & (total > NEG / 2)
    K1 = min(W + 1, C)  # a branch has only C candidates; min() is lossless
    M = min(C - 1, K1 + W + 1)  # shared non-blank lp lanes to carry
    lp_nb = jnp.where(jnp.arange(C)[None, :] == blank, NEG, lp)
    glv, gli = jax.lax.top_k(lp_nb, M)  # (B, M) shared lanes
    # Re-order the shared lanes LABEL-ascending (one tiny per-frame sort)
    # so the per-branch top_k below breaks value ties by lane position ==
    # label order — TF's exact in-branch tie rule — on the fast TopK path.
    # (A 2-key (value, label) lax.sort over the branch lanes was built
    # first and was bit-exact, but the variadic comparator sort bypassed
    # the TopK lowering: 22% of decode device time, traced on v5e.)
    gli_s, glv_s = jax.lax.sort(
        (gli.astype(jnp.int32), glv), dimension=1, num_keys=1
    )  # (B, M) labels asc, values co-sorted
    # child-stay exclusions, as per-branch LABEL SETS (<= W labels total):
    # stay k is branch i's child iff parent linkage matches; the excluded
    # label is then last_label[k].
    child_of = (
        (parent_hash[:, None, :] == hashes[:, :, None])
        & (parent_hash2[:, None, :] == hashes2[:, :, None])
        & (length[:, None, :] == length[:, :, None] + 1)
        & alive[:, None, :]
        & alive[:, :, None]
    )  # (B, i, k): stay k is branch i's child
    # shared lane masking: lane m of branch i dies if its label is branch
    # i's own last label (that lane is patched) or an excluded child label
    sh_excl = jnp.any(
        child_of[:, :, :, None]
        & (last_label[:, None, :, None] == gli_s[:, None, None, :]),
        axis=2,
    )  # (B, W, M)
    sh_own = gli_s[:, None, :] == last_label[:, :, None]  # (B, W, M)
    sh_vals = jnp.where(
        sh_excl | sh_own | ~alive[:, :, None],
        NEG,
        glv_s[:, None, :] + total[:, :, None],
    )  # (B, W, M)
    # per-branch top over the label-ordered shared lanes: positional ties
    # == label-ascending ties, so plain top_k is TF-exact here. The 2D
    # reshape matters: a 3D (B, W, M) top_k lowered as a full variadic
    # sort (19% of decode device time, traced), while (B*W, M) hits the
    # TopK lowering — same trick as the retired (B*W, C) prefilter.
    Ks = min(K1, M)
    sv_k1, sp_k1 = jax.lax.top_k(sh_vals.reshape(B * W, M), Ks)
    sv_k1 = sv_k1.reshape(B, W, Ks)
    sp_k1 = sp_k1.reshape(B, W, Ks)
    sl_k1 = jnp.sum(
        jnp.where(
            sp_k1[:, :, :, None]
            == jnp.arange(M, dtype=jnp.int32)[None, None, None, :],
            gli_s[:, None, None, :], 0,
        ),
        axis=3,
    )  # (B, W, Ks) labels of the selected shared lanes
    # patch lane: branch i's own last label rides the blank-only route —
    # unless that extension is itself a carried stay (child with the same
    # label), or the branch has no label yet (root), or the branch is dead.
    # Merge the single patch value into the sorted shared top by an
    # arithmetic insert at its exact (value desc, label asc) position.
    patch_excl = jnp.any(
        child_of & (last_label[:, None, :] == last_label[:, :, None]),
        axis=2,
    )  # (B, W)
    patch_ok = has_label & alive & ~patch_excl
    patch_val = jnp.where(patch_ok, p_b + lp_label, NEG)[:, :, None]
    patch_lab = jnp.where(patch_ok, last_label, blank)[:, :, None]
    beats = (sv_k1 > patch_val) | (
        (sv_k1 == patch_val) & (sl_k1 < patch_lab)
    )  # (B, W, Ks): shared entries ahead of the patch
    pos = jnp.sum(beats, axis=2, dtype=jnp.int32)[:, :, None]  # (B, W, 1)
    iK = jnp.arange(Ks + 1, dtype=jnp.int32)[None, None, :]
    prev_v = jnp.concatenate([sv_k1[:, :, :1], sv_k1], axis=2)
    prev_l = jnp.concatenate([sl_k1[:, :, :1], sl_k1], axis=2)
    here_v = jnp.concatenate([sv_k1, sv_k1[:, :, -1:]], axis=2)
    here_l = jnp.concatenate([sl_k1, sl_k1[:, :, -1:]], axis=2)
    cv_b = jnp.where(
        iK < pos, here_v,
        jnp.where(iK == pos, jnp.broadcast_to(patch_val, here_v.shape),
                  prev_v),
    )[:, :, :K1]  # (B, W, K1) values desc, ties label-asc — exact
    ci_b = jnp.where(
        iK < pos, here_l,
        jnp.where(iK == pos, jnp.broadcast_to(patch_lab, here_l.shape),
                  prev_l),
    )[:, :, :K1]
    pool_idx_b = (
        W + jnp.arange(W, dtype=jnp.int32)[None, :, None] * C + ci_b
    )  # (B, W, K1): each entry's index in the full [stays | cand] pool
    small_idx = jnp.concatenate(
        [jnp.broadcast_to(iW[None, :], (B, W)).astype(jnp.int32),
         pool_idx_b.reshape(B, W * K1)],
        axis=1,
    )  # (B, W + W*K1) -> full-pool index map

    def _topk_small(small_pool, k):
        """top_k over the reduced pool, returning full-pool indices."""
        tv, sp = jax.lax.top_k(small_pool, k)
        oh = sp[:, :, None] == jnp.arange(
            small_pool.shape[1], dtype=jnp.int32
        )[None, None, :]
        ti = jnp.sum(jnp.where(oh, small_idx[:, None, :], 0), axis=2)
        return tv, ti

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
    # top-W IS the sequential result. The zeroing test (second bullet) is
    # TIERED: the syntactic form (stay survived / no parent / parent not
    # earlier) decides 29/30 frames on near-uniform posteriors identically
    # to the full eviction bound (measured: cheap_ok == fast_ok, zero
    # rescues), so the expensive bound runs only in the fallback branch of
    # a nested cond — off the common path entirely.
    small_pool = jnp.concatenate(
        [s_total, cv_b.reshape(B, W * K1)], axis=1
    )  # (B, W + W*K1): lossless prefiltered pool in full-pool priority order
    topv1, topi1 = _topk_small(small_pool, W + 1)
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
    ok_c = (topv1[:, W - 1] > topv1[:, W]) | (topv1[:, W] <= NEG / 2)
    cheap_safe = (
        stay_in_top | ~parent_found | (parent_idx >= iW[None, :])
    )
    # cheap_ok implies fast_ok (cheap_safe is a subset of safe_zero below).
    cheap_s = ok_a & jnp.all(~bsel | cheap_safe, axis=1) & ok_c  # (B,)

    # Per-sample tensors for the tier machinery (module-level helpers);
    # sliced per DISPATCH_BLOCK below — samples decode independently, so
    # restricting every tensor to a block of rows is exact.
    per = dict(
        total=total, s_total=s_total, stay_total=stay_total,
        inv_perm=inv_perm, cv_b=cv_b, pool_idx_b=pool_idx_b,
        last_label=last_label, lp=lp, lp_label=lp_label,
        par_total=par_total, par_p_b=par_p_b, par_label=par_label,
        parent_found=parent_found, parent_idx=parent_idx, alive=alive,
        eligible=eligible, topv1=topv1, topi1=topi1, cheap_s=cheap_s,
        cheap_safe=cheap_safe, bsel=bsel, ok_a=ok_a, ok_c=ok_c,
    )

    if force_fast:  # debug/benchmark knob: skip the exactness fallback
        top_vals, top_idx = topv1[:, :W], topi1[:, :W]
    else:
        # Dispatch granularity: per-sub-block cond ladders (one per
        # DISPATCH_BLOCK rows) were built and MEASURED SLOWER on v5e in
        # BOTH regimes (sharp b256 13.0 -> 16.1 ms, near-uniform b256
        # 7.7 -> 11.2 ms at block=32): the bound/exact tiers are
        # LATENCY-bound (sequential W-sweep over tiny tensors), so a slow
        # block costs nearly as much as a slow full batch, and k dirty
        # blocks run k sequential slow paths where batch-global ran one.
        # Per-block only pays when dirty samples cluster into few blocks,
        # which the tier stats show they don't (tools/diag_beam_tiers.py).
        # DISPATCH_BLOCK <= 0 (default) = one batch-global ladder.
        blk = DISPATCH_BLOCK if DISPATCH_BLOCK > 0 else B
        outs = [
            _tier_dispatch(
                {k: v[s:s + blk] for k, v in per.items()}, W, C
            )
            for s in range(0, B, blk)
        ]
        if len(outs) == 1:
            top_vals, top_idx = outs[0]
        else:
            top_vals = jnp.concatenate([o[0] for o in outs], axis=0)
            top_idx = jnp.concatenate([o[1] for o in outs], axis=0)

    is_stay = top_idx < W
    oh_sorted = (
        jnp.minimum(top_idx, W - 1)[:, :, None] == iW[None, None, :]
    )  # one-hot over sorted stay positions
    stay_branch = _sel1(oh_sorted, perm)
    cand_branch = jnp.clip((top_idx - W) // C, 0, W - 1)
    cand_label = (top_idx - W) % C
    src = jnp.where(is_stay, stay_branch, cand_branch)  # carried slot

    oh_src = src[:, :, None] == iW[None, None, :]  # (B, W, W)
    gather = lambda a: _sel1(oh_src, a)
    n_total = top_vals
    n_p_b = jnp.where(is_stay, gather(new_p_b), NEG)
    n_p_nb = jnp.where(is_stay, gather(new_p_nb), top_vals)
    src_hash = gather(hashes)
    src_hash2 = gather(hashes2)
    lab1 = (cand_label + 1).astype(jnp.uint32)
    n_hash = jnp.where(is_stay, src_hash, src_hash * HASH_P + lab1)
    n_hash2 = jnp.where(is_stay, src_hash2, src_hash2 * HASH_P2 + lab1)
    n_parent_hash = jnp.where(is_stay, gather(parent_hash), src_hash)
    n_parent_hash2 = jnp.where(is_stay, gather(parent_hash2), src_hash2)
    n_last_label = jnp.where(is_stay, gather(last_label), cand_label)
    n_length = jnp.where(is_stay, gather(length), gather(length) + 1)
    n_alive = top_vals > NEG / 2
    bp_src = src.astype(jnp.int32)
    bp_label = jnp.where(is_stay | ~n_alive, -1, cand_label).astype(jnp.int32)

    new_state = (n_total, n_p_b, n_p_nb, n_hash, n_hash2, n_parent_hash,
                 n_parent_hash2, n_last_label, n_length, n_alive)
    if diag:
        dcounts = _evict_counts(per, W, C)
        ex_open, ex_zeroed = _exact_gates(per, dcounts, W, C)
        diag_out = (
            cheap_s, _bound_safe(per, dcounts, W, C), ok_a, ok_c,
            jnp.all(~bsel | cheap_safe, axis=1),
            bsel, cheap_safe, ex_open, ex_zeroed,
        )
        return new_state, (bp_src, bp_label), diag_out
    return new_state, (bp_src, bp_label)


def _init_state(B: int, W: int):
    """Initial beam state: root (empty prefix) alone."""
    return (
        jnp.full((B, W), NEG).at[:, 0].set(0.0),     # total
        jnp.full((B, W), NEG).at[:, 0].set(0.0),     # p_b
        jnp.full((B, W), NEG),                       # p_nb
        jnp.zeros((B, W), jnp.uint32),               # hashes
        jnp.zeros((B, W), jnp.uint32),               # hashes2
        jnp.full((B, W), ROOT_SENTINEL),             # parent_hash
        jnp.full((B, W), ROOT_SENTINEL),             # parent_hash2
        jnp.full((B, W), -1, jnp.int32),             # last_label
        jnp.zeros((B, W), jnp.int32),                # length
        jnp.zeros((B, W), bool).at[:, 0].set(True),  # alive
    )


@functools.partial(
    jax.jit, static_argnames=("beam_width",)
)
def ctc_beam_tier_stats(
    y_pred: jnp.ndarray,
    input_length: jnp.ndarray,
    beam_width: int = 10,
) -> Tuple[jnp.ndarray, ...]:
    """Per-(frame, sample) dispatch-tier admission for the exact decoder.

    Measurement tool (tools/diag_beam_tiers.py): returns a 9-tuple of
    boolean arrays, stacked over frames —
    ``(cheap, bound, ok_a, ok_c, ok_zero_cheap)`` each ``(T, B)`` (whether
    the tier-1 syntactic proof / tier-2 eviction bound admit each sample's
    fast path at each frame, plus tier-1's individual components), followed
    by ``(bsel, cheap_safe, exact_open, exact_zeroed)`` each ``(T, B, W)``
    (per-branch selection/safety flags and the exact tier's gate activity).
    The decode STATE advances through the normal (exact) dispatch, so the
    state trace matches production; the COST does not — diag mode pays the
    exact-tier gate computation on every frame by design.
    """
    B, T, C = y_pred.shape
    W = beam_width
    lp_all = jax.nn.log_softmax(
        jnp.log(y_pred.astype(jnp.float32) + KERAS_EPSILON), axis=-1
    )
    input_length = input_length.astype(jnp.int32).reshape(B)

    def step(state, inp):
        lp, t = inp
        new_state, _, diag_out = _beam_step(
            state, lp, W=W, C=C, diag=True
        )
        frozen = (t >= input_length)[:, None]
        out_state = tuple(
            jnp.where(frozen, old, new)
            for old, new in zip(state, new_state)
        )
        return out_state, tuple(
            d | (frozen if d.ndim == 2 else frozen[:, 0]) for d in diag_out
        )

    ts = jnp.arange(T, dtype=jnp.int32)
    _, diag = jax.lax.scan(
        step, _init_state(B, W), (jnp.transpose(lp_all, (1, 0, 2)), ts)
    )
    return diag


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

    state0 = _init_state(B, W)

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

    ts = jnp.arange(T, dtype=jnp.int32)
    (total, _, _, _, _, _, _, _, _, alive), (bps, bpl) = jax.lax.scan(
        step, state0, (jnp.transpose(lp_all, (1, 0, 2)), ts)
    )

    # Final beam is maintained in TF's final order (desc, stable) already.
    P = top_paths
    sel = jnp.arange(P, dtype=jnp.int32)[None, :].repeat(B, 0)  # (B, P)
    alive_sel = alive[:, :P]
    scores = jnp.where(alive_sel, total[:, :P], -jnp.inf)

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
