"""PE base correction in overlapped regions (reference: src/basecorrector.cpp:16-83).

For each overlap position i: p1 = start1 + i, p2 = start2 - i with
start1 = max(0, offset), start2 = len2 - max(0, -offset) - 1.  Where
seq1[p1] != complement(seq2[p2]), the Q30/Q14 asymmetry decides which mate is
overwritten.  Both mappings are affine, so the batched version gathers the
opposite mate at p2 = (start1 + start2) - j for row position j and applies
masked writes -- no scatters needed.
"""
from __future__ import annotations

import jax.numpy as jnp

from .common import pos_iota, complement, roll_front

GOOD_QUAL = 30 + 33  # num2qual(30) = '?'
BAD_QUAL = 14 + 33   # num2qual(14) = '/'


def _reverse_at(arr, c):
    """out[:, j] = arr[:, c-j] (0 where out of range): flip + variable roll.

    flip(arr)[j] = arr[L-1-j]; shifting by (L-1-c) gives arr[c-j].  c may
    exceed L-1 (large positive offsets), so both directions are applied."""
    from .common import roll_back
    L = arr.shape[1]
    shift = (L - 1) - c
    flipped = arr[:, ::-1]
    out = roll_front(flipped, jnp.maximum(shift, 0))
    return roll_back(out, jnp.maximum(-shift, 0))


def correct_by_overlap(seq1, qual1, len1, seq2, qual2, len2,
                       ov_overlapped, ov_offset, ov_overlap_len, ov_diff):
    """Returns (seq1', qual1', seq2', qual2', corr_matrix_idx_counts,
    corrected[B], r1_corrected[B], r2_corrected[B]).

    corr counts are returned as a flat [64] int32 vector indexed
    (from & 7) * 8 + (to & 7), matching FilterResult::addCorrection.
    """
    B, L = seq1.shape
    j = pos_iota(B, L)
    do = ov_overlapped & (ov_diff != 0)
    start1 = jnp.maximum(0, ov_offset)
    start2 = len2 - jnp.maximum(0, -ov_offset) - 1
    ol = ov_overlap_len

    # --- r1-side view: row position j = p1; i = j - start1; p2 = start1+start2-j
    i1 = j - start1[:, None]
    in_ov1 = (i1 >= 0) & (i1 < ol[:, None]) & do[:, None]
    c12 = start1 + start2
    s2g = _reverse_at(seq2, c12)
    q2g = _reverse_at(qual2, c12)
    mismatch1 = in_ov1 & (seq1 != complement(s2g))
    use_r1 = mismatch1 & (qual1 >= GOOD_QUAL) & (q2g <= BAD_QUAL)   # overwrite r2
    use_r2 = mismatch1 & ~use_r1 & (q2g >= GOOD_QUAL) & (qual1 <= BAD_QUAL)  # overwrite r1

    new_seq1 = jnp.where(use_r2, complement(s2g), seq1)
    new_qual1 = jnp.where(use_r2, q2g, qual1)

    # --- r2-side view: row position k = p2; i = start2 - k; p1 = start1+start2-k
    i2 = start2[:, None] - j
    in_ov2 = (i2 >= 0) & (i2 < ol[:, None]) & do[:, None]
    s1g = _reverse_at(seq1, c12)
    q1g = _reverse_at(qual1, c12)
    mismatch2 = in_ov2 & (s1g != complement(seq2))
    use_r1_2 = mismatch2 & (q1g >= GOOD_QUAL) & (qual2 <= BAD_QUAL)  # overwrite r2 here

    new_seq2 = jnp.where(use_r1_2, complement(s1g), seq2)
    new_qual2 = jnp.where(use_r1_2, q1g, qual2)

    # --- counters (use the r1-side view; one event per overlap position) ---
    # addCorrection(from=seq2[p2], to=complement(seq1[p1])) for use_r1
    # addCorrection(from=seq1[p1], to=complement(seq2[p2])) for use_r2
    from1 = (s2g & 7).astype(jnp.int32) * 8 + (complement(seq1) & 7).astype(jnp.int32)
    from2 = (seq1 & 7).astype(jnp.int32) * 8 + (complement(s2g) & 7).astype(jnp.int32)
    idx = jnp.where(use_r1, from1, jnp.where(use_r2, from2, 64))
    corr_matrix = jnp.zeros((65,), jnp.int32).at[idx.reshape(-1)].add(
        (use_r1 | use_r2).reshape(-1).astype(jnp.int32))[:64]

    corrected = jnp.sum((use_r1 | use_r2).astype(jnp.int32), axis=1)
    r2_corrected = jnp.any(use_r1, axis=1)
    r1_corrected = jnp.any(use_r2, axis=1)
    return (new_seq1, new_qual1, new_seq2, new_qual2, corr_matrix,
            corrected, r1_corrected, r2_corrected,
            {"mask1": use_r2, "mask2": use_r1_2})


def extract_deltas_sparse(mask, seq_new, qual_new, C: int):
    """Batch-level sparse (row, pos, base, qual) correction list.

    D2H transfer is O(C) instead of O(B*K): corrections are rare (Q30/Q14
    asymmetry in an overlap), so C=2048 covers virtually every batch; the
    host falls back to exact recomputation when count > C.
    Returns (rows[C] i32 with B as sentinel, pos[C] i32, base[C] u8,
    qual[C] u8, count i32).
    """
    B, L = mask.shape
    flat = mask.reshape(-1)
    idx = jnp.nonzero(flat, size=C, fill_value=B * L)[0]
    rows = (idx // L).astype(jnp.int32)
    pos = (idx - rows * L).astype(jnp.int32)
    safe = jnp.minimum(idx, B * L - 1)
    base = seq_new.reshape(-1)[safe]
    qual = qual_new.reshape(-1)[safe]
    count = jnp.sum(mask, dtype=jnp.int32)
    return rows, pos, base, qual, count


def extract_deltas(mask, seq_new, qual_new, K: int):
    """Extract up to K (position, base, qual) correction deltas per read.

    Device->host transfer shrinks from O(B*L) content arrays to O(B*K)
    bytes; rows with more than K corrections overflow (host falls back to
    an exact recomputation for those rare rows).
    Returns (pos[B,K] int32 with L as sentinel, base[B,K] u8, qual[B,K] u8,
             count[B] int32).
    """
    B, L = mask.shape
    jpos = pos_iota(B, L)
    count = jnp.sum(mask, axis=1, dtype=jnp.int32)
    m = mask
    poss, bass, quls = [], [], []
    for _ in range(K):
        any_ = jnp.any(m, axis=1)
        idx = jnp.argmax(m, axis=1).astype(jnp.int32)
        idx = jnp.where(any_, idx, L)
        safe = jnp.clip(idx, 0, L - 1)[:, None]
        poss.append(idx)
        bass.append(jnp.take_along_axis(seq_new, safe, axis=1)[:, 0])
        quls.append(jnp.take_along_axis(qual_new, safe, axis=1)[:, 0])
        m = m & (jpos != idx[:, None])
    return (jnp.stack(poss, axis=1), jnp.stack(bass, axis=1),
            jnp.stack(quls, axis=1), count)
