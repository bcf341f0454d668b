"""PE overlap analysis (reference: src/overlapanalysis.cpp:16-183).

The reference scans offsets sequentially per pair and accepts the first
offset whose Hamming-distance test passes, with an early-break quirk:
inside an offset the loop breaks at the first mismatch index i < 50 where
the running diff exceeds the limit; if the (limit+1)-th mismatch occurs at
i >= 50 the scan completes and the offset is accepted when i(=overlap_len)
exceeds 50.  Vectorized here as a lax.fori_loop over offsets carrying
"first acceptance wins" state for a whole batch.

merge() reproduces OverlapAnalysis::merge including the name tag.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import pos_iota, rc

COMPLETE_COMPARE_REQUIRE = 50


def _accept_at_offset(mm, olens, diff_limit: int, diff_pct: float):
    """Given mismatch mask mm[B, L] (i-th overlap position) and per-read
    overlap lengths, evaluate the reference acceptance rule at one offset.

    Returns (accept[B], diff[B]).
    """
    B, L = mm.shape
    i = pos_iota(B, L)
    in_ov = i < olens[:, None]
    mmv = mm & in_ov
    limit = jnp.minimum(diff_limit, (olens.astype(jnp.float32) * diff_pct).astype(jnp.int32))
    cum = jnp.cumsum(mmv.astype(jnp.int32), axis=1)
    total = cum[:, -1] if L > 0 else jnp.zeros((B,), jnp.int32)
    # first position where running diff exceeds limit (at a mismatch)
    exceed = mmv & (cum > limit[:, None])
    any_exceed = jnp.any(exceed, axis=1)
    first_exceed = jnp.argmax(exceed, axis=1).astype(jnp.int32)
    ok_small = total <= limit
    ok_late = any_exceed & (first_exceed >= COMPLETE_COMPARE_REQUIRE)
    return ok_small | ok_late, total


@partial(jax.jit, static_argnames=("diff_limit", "overlap_require", "diff_pct", "allow_gap"))
def analyze(seq1, len1, seq2, len2, diff_limit: int, overlap_require: int,
            diff_pct: float, allow_gap: bool = False):
    """Batched OverlapAnalysis::analyze.

    seq1/seq2: uint8[B, L] windowed reads; len1/len2: int32[B].
    Returns dict(overlapped bool[B], offset int32[B], overlap_len int32[B],
                 diff int32[B], has_gap bool[B]).
    """
    B, L = seq1.shape
    len1 = len1.astype(jnp.int32)
    len2 = len2.astype(jnp.int32)
    rc2 = rc(seq2, len2)
    pos = pos_iota(B, L)

    init = (jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))

    def fwd_body(off, state):
        found, f_off, f_ol, f_diff = state
        active = off < len1 - overlap_require
        olen = jnp.minimum(len1 - off, len2)
        # str1[off + i] vs str2[i]
        idx = jnp.minimum(pos + off, L - 1)
        s1 = jnp.take_along_axis(seq1, idx, axis=1)
        mm = s1 != rc2
        acc, diff = _accept_at_offset(mm, olen, diff_limit, diff_pct)
        new = acc & active & ~found
        return (found | new,
                jnp.where(new, off, f_off),
                jnp.where(new, olen, f_ol),
                jnp.where(new, diff, f_diff))

    state = jax.lax.fori_loop(0, L - overlap_require if L > overlap_require else 0,
                              fwd_body, init)

    def bwd_body(k, state):
        # offset = -k, k starts at 0 (reference re-tests offset 0 backwards)
        found, f_off, f_ol, f_diff = state
        active = k < len2 - overlap_require
        olen = jnp.minimum(len1, len2 - k)
        # str1[i] vs str2[k + i]
        idx = jnp.minimum(pos + k, L - 1)
        s2 = jnp.take_along_axis(rc2, idx, axis=1)
        mm = seq1 != s2
        acc, diff = _accept_at_offset(mm, olen, diff_limit, diff_pct)
        new = acc & active & ~found
        return (found | new,
                jnp.where(new, -k, f_off),
                jnp.where(new, olen, f_ol),
                jnp.where(new, diff, f_diff))

    state = jax.lax.fori_loop(0, L - overlap_require if L > overlap_require else 0,
                              bwd_body, state)
    found, off, ol, diff = state
    has_gap = jnp.zeros((B,), bool)

    if allow_gap:
        def gap_diff(ins, norm, cmplen, limit):
            """Matcher::diffWithOneInsertion vectorized (src/matcher.cpp:56-101).

            ins/norm: uint8[B, L] (ins compared at i, i+1; norm at i).
            cmplen/limit: int32[B]. Returns diff[B] (-1 = over limit)."""
            i = pos
            ins_sh = jnp.concatenate([ins[:, 1:], jnp.zeros((B, 1), ins.dtype)], axis=1)
            acc_l = jnp.cumsum(((ins != norm) & (i < cmplen[:, None])).astype(jnp.int32), axis=1)
            # accRight[i] = mismatches of ins[i+1..cmplen] vs norm[i..cmplen-1]
            mm_r = ((ins_sh != norm) & (i < cmplen[:, None])).astype(jnp.int32)
            suf = jnp.cumsum(mm_r[:, ::-1], axis=1)[:, ::-1]  # suffix sums from i
            # valid insertion points i in [1, cmplen); diff = accL[i-1] + accR[i]
            accl_prev = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), acc_l[:, :-1]], axis=1)
            cand = accl_prev + suf
            valid = (i >= 1) & (i < cmplen[:, None])
            min_diff = jnp.min(jnp.where(valid, cand, 10 ** 8), axis=1)
            # accLeft[cmplen-2] + accRight[cmplen-1] > limit -> -1
            idx2 = jnp.clip(cmplen - 2, 0, L - 1)[:, None]
            last_l = jnp.take_along_axis(acc_l, idx2, axis=1)[:, 0]
            idxr = jnp.clip(cmplen - 1, 0, L - 1)[:, None]
            last_r = jnp.take_along_axis(suf, idxr, axis=1)[:, 0]
            over = (last_l + last_r) > limit
            has_cand = jnp.any(valid, axis=1)
            return jnp.where(over | ~has_cand, -1, min_diff)

        def gap_fwd_body(off, state):
            found, f_off, f_ol, f_diff, f_gap = state
            active = off < len1 - overlap_require
            olen = jnp.minimum(len1 - off, len2)
            limit = jnp.minimum(diff_limit,
                                (olen.astype(jnp.float32) * diff_pct).astype(jnp.int32))
            idx = jnp.minimum(pos + off, L - 1)
            s1 = jnp.take_along_axis(seq1, idx, axis=1)
            s1_sh = jnp.concatenate([s1[:, 1:], jnp.zeros((B, 1), s1.dtype)], axis=1)
            cl = olen - 1
            # diffWithOneInsertion(str1+offset, str2, olen-1, limit)
            d1 = gap_diff(s1, rc2, cl, limit)
            # fallback: diffWithOneInsertion(str2, str1+offset, ...)
            d2 = gap_diff(rc2, s1, cl, limit)
            diff = jnp.where((d1 < 0) | (d1 > limit), d2, d1)
            acc = (diff <= limit) & (diff >= 0)
            new = acc & active & ~found
            return (found | new, jnp.where(new, off, f_off),
                    jnp.where(new, olen, f_ol), jnp.where(new, diff, f_diff),
                    jnp.where(new, True, f_gap))

        def gap_bwd_body(k, state):
            found, f_off, f_ol, f_diff, f_gap = state
            active = k < len2 - overlap_require
            olen = jnp.minimum(len1, len2 - k)
            limit = jnp.minimum(diff_limit,
                                (olen.astype(jnp.float32) * diff_pct).astype(jnp.int32))
            idx = jnp.minimum(pos + k, L - 1)
            s2 = jnp.take_along_axis(rc2, idx, axis=1)
            cl = olen - 1
            d1 = gap_diff(seq1, s2, cl, limit)
            d2 = gap_diff(s2, seq1, cl, limit)
            diff = jnp.where((d1 < 0) | (d1 > limit), d2, d1)
            acc = (diff <= limit) & (diff >= 0)
            new = acc & active & ~found
            return (found | new, jnp.where(new, -k, f_off),
                    jnp.where(new, olen, f_ol), jnp.where(new, diff, f_diff),
                    jnp.where(new, True, f_gap))

        gstate = (found, off, ol, diff, has_gap)
        gstate = jax.lax.fori_loop(0, L - overlap_require if L > overlap_require else 0,
                                   gap_fwd_body, gstate)
        gstate = jax.lax.fori_loop(0, L - overlap_require if L > overlap_require else 0,
                                   gap_bwd_body, gstate)
        found, off, ol, diff, has_gap = gstate

    return {
        "overlapped": found,
        "offset": jnp.where(found, off, 0),
        "overlap_len": jnp.where(found, ol, 0),
        "diff": jnp.where(found, diff, 0),
        "has_gap": has_gap & found,
    }
