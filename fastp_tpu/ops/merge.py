"""PE merging (reference: src/overlapanalysis.cpp:152-183).

merged = r1[0:len1_m] + (offset > 0 ? rc(r2)[ol : ol+len2_m] : "")
  len1_m = ol + max(0, offset); len2_m = (offset > 0) ? r2.len - ol : 0
Quality concatenated the same way; the reversed r2 quality rides along with
the reverse complement.  The host appends the " merged_<len1>_<len2>" name tag.
"""
from __future__ import annotations

import jax.numpy as jnp

from .common import pos_iota, rc, reverse_rows


def merge_pairs(seq1, qual1, len1, seq2, qual2, len2,
                ov_overlapped, ov_offset, ov_overlap_len, out_width: int):
    """Returns (m_seq[B, out_width], m_qual[B, out_width], m_len[B],
    len1_m[B], len2_m[B]).  Rows where not overlapped are zero-length."""
    B, L = seq1.shape
    ol = ov_overlap_len
    len1_m = ol + jnp.maximum(0, ov_offset)
    len2_m = jnp.where(ov_offset > 0, len2 - ol, 0)
    m_len = jnp.where(ov_overlapped, len1_m + len2_m, 0)

    rc2 = rc(seq2, len2)
    rq2 = reverse_rows(qual2, len2)

    j = pos_iota(B, out_width)
    # part 1: j < len1_m -> r1[j]; part 2: rc2[ol + (j - len1_m)] = rc2[j - max(0, off)]
    def pad_to(a):
        if out_width > L:
            return jnp.concatenate([a, jnp.zeros((B, out_width - L), a.dtype)], axis=1)
        return a[:, :out_width]

    take1_s = pad_to(seq1)
    take1_q = pad_to(qual1)
    s = jnp.maximum(0, ov_offset)
    from .common import roll_back
    take2_s = roll_back(pad_to(rc2), s)
    take2_q = roll_back(pad_to(rq2), s)

    in1 = j < len1_m[:, None]
    in2 = (j >= len1_m[:, None]) & (j < m_len[:, None])
    m_seq = jnp.where(in1, take1_s, jnp.where(in2, take2_s, 0))
    m_qual = jnp.where(in1, take1_q, jnp.where(in2, take2_q, 0))
    return m_seq, m_qual, m_len, len1_m, len2_m
