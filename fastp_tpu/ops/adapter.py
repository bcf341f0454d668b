"""Adapter trimming (reference: src/adaptertrimmer.cpp:16-170).

trim_by_sequence reproduces AdapterTrimmer::trimBySequence:
  * Hamming scan from a negative start (A-tailing dimers) with
    1-mismatch-per-8bp allowance; first matching pos wins.  Vectorized as a
    static loop over the adapter's bases accumulating a [B, P] mismatch
    matrix (P = candidate positions), then a first-true reduction.
  * insertion/deletion fallbacks: the reference loops over pos but calls
    Matcher::matchWithOneInsertion(rdata, adata, cmplen, ...) WITHOUT
    offsetting rdata by pos (src/adaptertrimmer.cpp:120-147) -- the result
    depends on pos only through cmplen.  We evaluate the match for every
    possible cmplen (a static table of ~alen entries) and derive the first
    matching pos analytically.
trim_by_overlap reproduces trimByOverlapAnalysis (negative-offset clipping).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .common import pos_iota

ALLOW_ONE_MISMATCH_FOR_EACH = 8


def _match_with_one_insertion_static(ins, norm, cmplen: int, limit: int):
    """Matcher::matchWithOneInsertion (src/matcher.cpp:10-54) with static
    cmplen/limit.  ins: uint8[B, >=cmplen+1], norm: uint8[B, >=cmplen].
    Returns bool[B].

    The reference scans insertion points i in [1, cmplen) ascending,
    returning false at the first i with accLeft[i-1]+accRight[cmplen-1] >
    limit and true at the first i with accLeft[i-1]+accRight[i] <= limit
    (the fail check runs first).
    """
    B = ins.shape[0]
    if cmplen < 1 or limit < 0:
        return jnp.zeros((B,), bool)
    mm_l = (ins[:, :cmplen] != norm[:, :cmplen]).astype(jnp.int32)
    acc_l = jnp.cumsum(mm_l, axis=1)  # acc_l[:, i] = accLeft[i]
    mm_r = (ins[:, 1:cmplen + 1] != norm[:, :cmplen]).astype(jnp.int32)
    acc_r = jnp.cumsum(mm_r[:, ::-1], axis=1)[:, ::-1]  # acc_r[:, i] = accRight[i]
    if cmplen == 1:
        return jnp.zeros((B,), bool)  # loop range [1, 1) empty -> minDiff stays huge
    accl_prev = acc_l[:, :cmplen - 1]          # accLeft[i-1] for i in [1, cmplen)
    accr_i = acc_r[:, 1:cmplen]                # accRight[i] for i in [1, cmplen)
    accr_last = acc_r[:, cmplen - 1][:, None]
    fail_here = (accl_prev + accr_last) > limit
    succ_here = (accl_prev + accr_i) <= limit
    stop = fail_here | succ_here
    any_stop = jnp.any(stop, axis=1)
    first_stop = jnp.argmax(stop, axis=1)
    failed = jnp.take_along_axis(fail_here, first_stop[:, None], axis=1)[:, 0]
    return any_stop & ~failed


def trim_by_sequence(bases, lengths, adapter: bytes, match_req: int = 4):
    """Returns (new_len[B], found[B], pos[B]) -- pos may be negative.

    When found & pos < 0 the read is emptied (resize(0)); the recorded
    adapter is adapter[:alen+pos].  When pos >= 0 the recorded adapter is
    the read suffix seq[pos:old_len] (host extracts the bytes).
    """
    B, L = bases.shape
    alen = len(adapter)
    rlen = lengths.astype(jnp.int32)

    if alen < match_req:
        return rlen, jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32)

    start = 0
    if alen >= 16:
        start = -4
    elif alen >= 12:
        start = -3
    elif alen >= 8:
        start = -2

    a_np = np.frombuffer(adapter, dtype=np.uint8)
    a = jnp.asarray(a_np)

    # --- phase 1: Hamming scan ---
    # positions p = start + pp for pp in [0, n_p)
    n_p = L - match_req - start
    ppos = pos_iota(B, n_p) + start  # [B, n_p] actual p values
    mism = jnp.zeros((B, n_p), jnp.int32)
    # pad bases so that index p+i in [-4, L+alen) is safe
    pad = jnp.zeros((B, alen + 4), jnp.uint8)
    bpad = jnp.concatenate([jnp.zeros((B, 4), jnp.uint8), bases, pad], axis=1)
    cols = []
    for i in range(alen):
        # read[p+i] with p = start + pp -> bpad[:, 4 + start + pp + i]
        col = bpad[:, 4 + start + i: 4 + start + i + n_p]
        valid = ((ppos + i) >= 0) & ((ppos + i) < rlen[:, None]) & (i < jnp.minimum(rlen[:, None] - ppos, alen))
        cols.append(((col != a_np[i]) & valid).astype(jnp.int32))
    mism = sum(cols)
    cmplen = jnp.minimum(rlen[:, None] - ppos, alen)
    allowed = cmplen // ALLOW_ONE_MISMATCH_FOR_EACH
    active = ppos < (rlen[:, None] - match_req)
    matched = (mism <= allowed) & active
    found_h = jnp.any(matched, axis=1)
    pp_first = jnp.argmax(matched, axis=1).astype(jnp.int32)
    pos_h = jnp.where(found_h, pp_first + start, 0)

    # --- phases 2+3: insertion / deletion fallback tables ---
    # adapter broadcast once; reads compared from index 0 (reference quirk).
    # Both sides padded to width alen+1 so any cmplen <= alen slices safely;
    # actual cmplen values never index past real content (see comments above).
    W = alen + 1
    a_b = jnp.broadcast_to(jnp.asarray(np.pad(a_np, (0, 1))), (B, W))
    if L >= W:
        b_cut = bases[:, :W]
    else:
        b_cut = jnp.concatenate([bases, jnp.zeros((B, W - L), jnp.uint8)], axis=1)

    ins_tbl = {}
    del_tbl = {}
    for cl in range(1, alen + 1):
        lim = cl // ALLOW_ONE_MISMATCH_FOR_EACH - 1
        if lim < 0:
            ins_tbl[cl] = jnp.zeros((B,), bool)
            del_tbl[cl] = jnp.zeros((B,), bool)
            continue
        ins_tbl[cl] = _match_with_one_insertion_static(b_cut, a_b, cl, lim)
        if cl <= alen - 1:
            del_tbl[cl] = _match_with_one_insertion_static(a_b, b_cut, cl, lim)

    def first_match_from_table(tbl, cl_of_p0, p_of_cl, p_limit):
        """First pos: cl descends from cl_of_p0 as p ascends; pick max cl."""
        found = jnp.zeros((B,), bool)
        pos = jnp.zeros((B,), jnp.int32)
        best_cl = jnp.full((B,), -1, jnp.int32)
        for cl, m in tbl.items():
            cand = m & (cl <= cl_of_p0) & (cl > best_cl)
            best_cl = jnp.where(cand, cl, best_cl)
        has = best_cl >= 0
        p = jnp.where(best_cl == cl_of_p0, 0, p_of_cl(best_cl))
        valid = has & (p >= 0) & (p < p_limit) & (p_limit > 0)
        return valid, jnp.where(valid, p, 0)

    # insertion: cmplen(p) = min(rlen-p-1, alen); p in [0, rlen-match_req-1)
    cl0_ins = jnp.minimum(rlen - 1, alen)
    f_ins, p_ins = first_match_from_table(
        ins_tbl, cl0_ins, lambda cl: rlen - 1 - cl, rlen - match_req - 1)
    # deletion: cmplen(p) = min(rlen-p, alen-1); p in [0, rlen-match_req)
    cl0_del = jnp.minimum(rlen, alen - 1)
    f_del, p_del = first_match_from_table(
        del_tbl, cl0_del, lambda cl: rlen - cl, rlen - match_req)

    found = found_h | f_ins | f_del
    fpos = jnp.where(found_h, pos_h, jnp.where(f_ins, p_ins, p_del))

    new_len = jnp.where(found & (fpos < 0), 0,
                        jnp.where(found, jnp.minimum(jnp.maximum(fpos, 0), rlen), rlen))
    return new_len, found, fpos


def trim_by_overlap(len1, len2, ov_overlapped, ov_offset, ov_overlap_len,
                    front_trimmed1, front_trimmed2):
    """AdapterTrimmer::trimByOverlapAnalysis (src/adaptertrimmer.cpp:16-45).

    When overlapped & offset < 0:
      new_len1 = min(len1, ol + frontTrimmed2); new_len2 = min(len2, ol + frontTrimmed1)
    Returns (new_len1, new_len2, trimmed[B]).  The host records
    adapter1 = r1.seq[new_len1:len1] and adapter2 = r2.seq[new_len2:len2].
    """
    do = ov_overlapped & (ov_offset < 0)
    ol = ov_overlap_len
    nl1 = jnp.minimum(len1, ol + front_trimmed2)
    nl2 = jnp.minimum(len2, ol + front_trimmed1)
    return (jnp.where(do, nl1, len1), jnp.where(do, nl2, len2), do)
