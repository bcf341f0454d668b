"""Read filtering verdicts (reference: src/filter.cpp:14-81, 224-258).

pass_filter reproduces Filter::passFilter exactly, including the quirk that
low-quality / N counting only happens when quality OR length filtering is
enabled, and the integer average-quality division.
"""
from __future__ import annotations

import jax.numpy as jnp

from .common import pos_iota, N
from ..config import (PASS_FILTER, FAIL_N_BASE, FAIL_LENGTH, FAIL_TOO_LONG,
                      FAIL_QUALITY, FAIL_COMPLEXITY)


def pass_filter(bases, quals, lengths, alive, cfg):
    """Returns int32[B] filter result codes.

    `alive=False` (reference NULL read) or empty read -> FAIL_LENGTH.
    cfg: qualfilter_enabled, qualifiedQual, unqualifiedPercentLimit,
    avgQualReq, nBaseLimit, lengthFilter_enabled, requiredLength, maxLength,
    complexity_enabled, complexity_threshold (static).
    """
    B, L = bases.shape
    rlen = lengths.astype(jnp.int32)
    pos = pos_iota(B, L)
    in_read = pos < rlen[:, None]
    q = quals.astype(jnp.int32)

    result = jnp.full((B,), PASS_FILTER, jnp.int32)

    if cfg.qualfilter_enabled or cfg.lengthFilter_enabled:
        total_qual = jnp.sum(jnp.where(in_read, q - 33, 0), axis=1)
        low_qual = jnp.sum(jnp.where(in_read & (q < cfg.qualifiedQual), 1, 0), axis=1)
        n_base = jnp.sum(jnp.where(in_read & (bases == N), 1, 0), axis=1)
    else:
        total_qual = low_qual = n_base = jnp.zeros((B,), jnp.int32)

    if cfg.qualfilter_enabled:
        safe_len = jnp.maximum(rlen, 1)
        # lowQualNum > limit*rlen/100.0 -- exact as an integer rational compare
        # (low is an integer, so double rounding of limit*rlen/100.0 can never
        #  flip the comparison; see tests/test_filter.py)
        fail_q = low_qual * 100 > cfg.unqualifiedPercentLimit * rlen
        if cfg.avgQualReq > 0:
            fail_q = fail_q | ((total_qual // safe_len) < cfg.avgQualReq)
        fail_n = (~fail_q) & (n_base > cfg.nBaseLimit)
        result = jnp.where(fail_q & (result == PASS_FILTER), FAIL_QUALITY, result)
        result = jnp.where(fail_n & (result == PASS_FILTER), FAIL_N_BASE, result)

    if cfg.lengthFilter_enabled:
        result = jnp.where((result == PASS_FILTER) & (rlen < cfg.requiredLength),
                           FAIL_LENGTH, result)
        if cfg.maxLength > 0:
            result = jnp.where((result == PASS_FILTER) & (rlen > cfg.maxLength),
                               FAIL_TOO_LONG, result)

    if cfg.complexity_enabled:
        nxt = jnp.concatenate([bases[:, 1:], jnp.zeros((B, 1), bases.dtype)], axis=1)
        diff = jnp.sum(jnp.where((pos < (rlen - 1)[:, None]) & (bases != nxt), 1, 0), axis=1)
        # passLowComplexityFilter: length <= 1 -> fail.
        # threshold is percent/100.0; diff/(len-1) >= k/100 compared exactly
        # in integers (equivalent to the reference's double comparison since
        # the rationals involved are far coarser than double ulps).
        passed_cx = (rlen > 1) & (diff * 100 >= cfg.complexity_threshold_percent * (rlen - 1))
        result = jnp.where((result == PASS_FILTER) & ~passed_cx, FAIL_COMPLEXITY, result)

    # NULL read or zero length dominates everything (checked first in reference)
    result = jnp.where(~alive | (rlen == 0), FAIL_LENGTH, result)
    return result
