"""PolyG / polyX tail trimming (reference: src/polyx.cpp:16-116).

Both scan from the 3' end with <=1 mismatch per 8 bases and max 5 mismatches,
replicated here with suffix-order cumulative counts and first-break selection.
"""
from __future__ import annotations

import jax.numpy as jnp

from .common import pos_iota, first_true_index, reverse_rows, A, T, C, G, N

ALLOW_ONE_MISMATCH_FOR_EACH = 8
MAX_MISMATCH = 5


def trim_polyg(bases, lengths, compare_req: int):
    """reference: src/polyx.cpp:16-42. Returns new lengths."""
    B, L = bases.shape
    rlen = lengths.astype(jnp.int32)
    # tail-order view: tail[b, i] = bases[b, rlen-1-i]
    tail = reverse_rows(bases, rlen)
    i = pos_iota(B, L)
    in_read = i < rlen[:, None]
    is_g = (tail == G) & in_read
    mism = jnp.cumsum((~is_g & in_read).astype(jnp.int32), axis=1)  # mismatch after iter i
    allowed = (i + 1) // ALLOW_ONE_MISMATCH_FOR_EACH
    brk = (mism > MAX_MISMATCH) | ((mism > allowed) & (i >= compare_req - 1))
    brk = brk & in_read
    i_final = first_true_index(brk, default=rlen)  # break index, or rlen if loop completed
    # firstGPos: last G seen at iter <= i_final (inclusive), position rlen-1-i
    g_upto = is_g & (i <= i_final[:, None])
    any_g = jnp.any(g_upto, axis=1)
    i_last_g = (L - 1) - jnp.argmax(g_upto[:, ::-1], axis=1).astype(jnp.int32)
    first_g_pos = jnp.where(any_g, rlen - 1 - i_last_g, rlen - 1)
    do_trim = i_final >= compare_req
    # Read::resize ignores len > length or < 0 (src/read.cpp:62-67)
    new_len = jnp.where(do_trim & (first_g_pos >= 0) & (first_g_pos <= rlen), first_g_pos, rlen)
    return new_len


def trim_polyx(bases, lengths, compare_req: int):
    """reference: src/polyx.cpp:49-116.

    Returns (new_lengths, trimmed_mask, poly_base_idx, trimmed_bases) where
    poly_base_idx is 0..3 for A/T/C/G (valid when trimmed_mask) and
    trimmed_bases = pos+1 recorded by FilterResult::addPolyXTrimmed.
    """
    B, L = bases.shape
    rlen = lengths.astype(jnp.int32)
    tail = reverse_rows(bases, rlen)
    i = pos_iota(B, L)
    in_read = i < rlen[:, None]

    counts = []
    for b_ascii in (A, T, C, G):
        hit = ((tail == b_ascii) | (tail == N)) & in_read
        counts.append(jnp.cumsum(hit.astype(jnp.int32), axis=1))
    cnt = jnp.stack(counts, axis=0)  # [4, B, L] counts after iter i

    cmp = i + 1
    allowed = jnp.minimum(MAX_MISMATCH, cmp // ALLOW_ONE_MISMATCH_FOR_EACH)
    ok_any = jnp.zeros((B, L), bool)
    for b in range(4):
        ok_any = ok_any | (cmp - cnt[b] <= allowed)
    need_break = ~ok_any
    brk = need_break & ((i >= ALLOW_ONE_MISMATCH_FOR_EACH) | (cmp >= compare_req - 1)) & in_read
    pos_final = first_true_index(brk, default=rlen)  # `pos` after the loop

    has_poly = pos_final + 1 >= compare_req

    # counters at iteration pos_final (inclusive); gather cnt[:, b, pos_final]
    idx = jnp.clip(pos_final, 0, L - 1)[:, None]
    at_break = [jnp.take_along_axis(cnt[b], idx, axis=1)[:, 0] for b in range(4)]
    at_break = jnp.stack(at_break, axis=1)  # [B, 4]
    # pos_final == rlen means loop completed; counts at last in-read iter == totals
    # (cumsum is constant beyond the read, so the clipped gather is still right
    #  as long as rlen >= 1; rlen == 0 rows have has_poly False for compare_req>0)
    # first max wins (strict > updates): argmax returns first maximal index
    poly = jnp.argmax(at_break, axis=1).astype(jnp.int32)
    poly_ascii = jnp.array([A, T, C, G], jnp.uint8)[poly]

    # while(data[rlen-pos-1] != polyBase && pos>=0) pos--
    # -> largest p <= pos_final with tail[p] == polyBase, else -1
    match = (tail == poly_ascii[:, None]) & (i <= pos_final[:, None]) & in_read
    anym = jnp.any(match, axis=1)
    last = (L - 1) - jnp.argmax(match[:, ::-1], axis=1).astype(jnp.int32)
    pos2 = jnp.where(anym, last, -1)

    new_len = jnp.where(has_poly, rlen - pos2 - 1, rlen)
    # resize guard (len > length or < 0 -> no-op)
    new_len = jnp.where((new_len >= 0) & (new_len <= rlen), new_len, rlen)
    trimmed_bases = jnp.where(has_poly, pos2 + 1, 0)
    return new_len, has_poly, poly, trimmed_bases
