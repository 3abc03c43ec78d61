"""On-device batched edit distance (reference C9/C20, SURVEY.md §2.2).

The reference computes CER on the host through the C++ ``editdistance``
pybind package, one pair at a time. At eval scale that means shipping every
decoded sequence back over the wire each validation pass. This module keeps
the whole metric on-device: a batched Levenshtein DP that consumes the
greedy decoder's dense label output directly, so a validation pass returns
two scalars (edit-distance sum, reference-length sum) instead of B
sequences.

TPU mapping — the classic row-by-row DP is hostile (the in-row dependency
``D[i,j-1]`` serializes the lane dimension), so we sweep ANTI-DIAGONALS:
``D[i,j]`` on diagonal ``d=i+j`` depends only on diagonals ``d-1`` and
``d-2``, making every cell of a diagonal independent. One ``lax.scan`` of
``La+Lb-1`` steps, each an elementwise min over a ``(B, La+1)`` block on
the VPU — no gathers, no host sync, O(La+Lb) sequential depth instead of
O(La*Lb).

Semantics match ``utils.metrics.levenshtein`` (host oracle) exactly; both
are unit-cost insert/delete/substitute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# plain int (NOT a jnp scalar: that would initialize the backend at import
# time — imports must stay device-free; one TPU grant per host)
_BIG = 1 << 29


@functools.partial(jax.jit, static_argnames=())
def batched_levenshtein(
    a: jnp.ndarray,
    length_a: jnp.ndarray,
    b: jnp.ndarray,
    length_b: jnp.ndarray,
) -> jnp.ndarray:
    """Unit-cost edit distance per row: ``out[k] = lev(a[k,:la[k]], b[k,:lb[k]])``.

    Args:
      a: (B, La) int labels; entries past ``length_a`` are ignored.
      length_a: (B,) valid lengths into ``a``.
      b: (B, Lb) int labels; entries past ``length_b`` are ignored.
      length_b: (B,) valid lengths into ``b``.

    Returns:
      (B,) int32 edit distances.
    """
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    la = jnp.asarray(length_a, jnp.int32).reshape(-1)
    lb = jnp.asarray(length_b, jnp.int32).reshape(-1)
    B, La = a.shape
    Lb = b.shape[1]

    # cost lookup for diagonal d: cell i compares a[i-1] vs b[d-1-i].
    # b[d-1-i] is a contiguous slice of reversed-b: rev_b[Lb-d+i]; pad both
    # ends so the dynamic_slice start (Lb-d) stays in range for all d.
    rev_b = b[:, ::-1]
    pad = La + 1
    rev_b_pad = jnp.pad(rev_b, ((0, 0), (pad, pad)), constant_values=-7)
    a_shift = jnp.pad(a, ((0, 0), (1, 0)), constant_values=-9)[:, : La + 1]

    idx = jnp.arange(La + 1, dtype=jnp.int32)  # cell index i on a diagonal

    # diagonal 0: D[0,0]=0; diagonal 1: D[1,0]=D[0,1]=1.
    prev2 = jnp.where(idx == 0, 0, _BIG) * jnp.ones((B, 1), jnp.int32)
    prev1 = jnp.where(idx <= 1, 1, _BIG) * jnp.ones((B, 1), jnp.int32)
    # distances for degenerate totals captured before the scan starts:
    # la+lb==0 -> 0; la+lb==1 -> 1 (one is empty, the other length 1).
    total = la + lb
    res0 = jnp.where(total == 0, 0, jnp.where(total == 1, 1, -1)).astype(
        jnp.int32
    )

    def step(carry, d):
        prev1, prev2, res = carry
        # substitution cost vector: a[i-1] != b[d-1-i] for i = 0..La
        bcol = jax.lax.dynamic_slice_in_dim(
            rev_b_pad, jnp.int32(pad) + Lb - d, La + 1, axis=1
        )
        sub = (a_shift != bcol).astype(jnp.int32)
        shift1 = jnp.pad(prev1, ((0, 0), (1, 0)), constant_values=_BIG)[
            :, : La + 1
        ]
        shift2 = jnp.pad(prev2, ((0, 0), (1, 0)), constant_values=_BIG)[
            :, : La + 1
        ]
        cur = jnp.minimum(
            jnp.minimum(shift1 + 1, prev1 + 1), shift2 + sub
        )
        # boundary rows of the DP table: D[0,d] = d (i==0), D[d,0] = d.
        cur = jnp.where((idx == 0) | (idx == d), d, cur)
        cur = jnp.minimum(cur, _BIG)  # keep garbage lanes from overflowing
        # capture D[la, lb] the step its diagonal is swept
        hit = jnp.take_along_axis(cur, la[:, None], axis=1)[:, 0]
        res = jnp.where(total == d, hit, res)
        return (cur, prev1, res), None

    (_, _, res), _ = jax.lax.scan(
        step,
        (prev1, prev2, res0),
        jnp.arange(2, La + Lb + 1, dtype=jnp.int32),
    )
    return res


def cer_sums_on_device(
    decoded: jnp.ndarray,
    ref_labels: jnp.ndarray,
    ref_length: jnp.ndarray,
) -> tuple:
    """CER accumulators from the greedy decoder's dense output.

    ``decoded``: (B, T) int32, left-packed, -1 padded (the
    ``ops.ctc.ctc_greedy_decode`` / TF ``ctc_decode`` dense convention).
    Returns scalar ``(edit_distance_sum, reference_length_sum)``; CER over
    any number of batches = sum(dists) / max(sum(ref_lens), 1) — identical
    to ``utils.metrics.cer`` on the decoded texts (codec map is a bijection
    on labels, so label-space and text-space distances agree).
    """
    decoded = jnp.asarray(decoded, jnp.int32)
    dec_len = jnp.sum(decoded >= 0, axis=1).astype(jnp.int32)
    ref_length = jnp.asarray(ref_length, jnp.int32).reshape(-1)
    d = batched_levenshtein(decoded, dec_len, ref_labels, ref_length)
    return jnp.sum(d), jnp.sum(ref_length)
