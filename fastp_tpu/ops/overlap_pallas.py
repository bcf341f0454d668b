"""Pallas TPU kernel for the PE overlap mismatch sweep.

Alternative to the one-hot convolution in ops/overlap.py: byte compares run
directly on VMEM-resident tiles, so the whole offset sweep is one kernel
with no HBM traffic per offset and no one-hot materialization.  Exact for
any byte alphabet (it compares raw bytes, like the reference's C++ loop).

Default on real accelerators (smaller executable, no clean/dirty cond);
the conv path is the default on the CPU backend, where this kernel would
run interpreted.  Override either way with FASTP_TPU_PALLAS_OVERLAP=1/0
(see ops/overlap.py:analyze for the dispatch).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import rc
from .overlap import COMPLETE_COMPARE_REQUIRE, _select_first_accept


def _mm_kernel(n_off: int, L: int, a_pad_ref, b_pad_ref, la_ref, lb_ref,
               mm_ref, mm50_ref):
    """mm[t, r] = #{i : a[r, t+i] != b[r, i], i < lb[r], t+i < la[r]}.

    The shift runs as a dynamic lane rotation of b (Mosaic forbids
    dynamic lane-dim slices that aren't 128-aligned): after roll(b, t),
    position j holds b[j-t], so compare a[j] vs roll(b)[j] for j >= t.
    Outputs are [NOFFP, TB] so the per-offset store writes sublane rows.
    """
    TB, W = b_pad_ref.shape
    jpos = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
    # Mosaic's lane rotate is 32-bit only: widen the byte tiles once
    aseq = a_pad_ref[:].astype(jnp.int32)
    bseq = b_pad_ref[:].astype(jnp.int32)
    la = la_ref[:, 0:1]  # [TB, 1] int32 (lengths replicated across lanes)
    lb = lb_ref[:, 0:1]
    in_a = jpos < la

    def body(t, _):
        bt = pltpu.roll(bseq, t, axis=1)
        i_rel = jpos - t
        valid = (i_rel >= 0) & (i_rel < lb) & in_a
        m = (aseq != bt) & valid
        mm_ref[t, :] = jnp.sum(m, axis=1).astype(jnp.int32)
        mm50_ref[t, :] = jnp.sum(
            m & (i_rel < COMPLETE_COMPARE_REQUIRE), axis=1).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_off, body, 0)


def mm_sweep(a, b, la, lb, n_off: int, interpret: bool = False):
    """Mismatch matrices for a-shifted-vs-b comparisons.

    a, b: uint8[B, L]; la, lb: int32[B].
    Returns (mm[B, n_off], mm50[B, n_off]) int32.
    """
    B, L = a.shape
    TB = 256
    while B % TB != 0:
        TB //= 2
    NOFFP = -(-n_off // 8) * 8
    W = -(-2 * L // 128) * 128  # lane dim must be 128-aligned
    a_pad = jnp.pad(a, ((0, 0), (0, W - L)))
    b_pad = jnp.pad(b, ((0, 0), (0, W - L)))
    la2 = jnp.broadcast_to(la.reshape(B, 1).astype(jnp.int32), (B, 128))
    lb2 = jnp.broadcast_to(lb.reshape(B, 1).astype(jnp.int32), (B, 128))
    mm, mm50 = pl.pallas_call(
        functools.partial(_mm_kernel, n_off, L),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((NOFFP, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NOFFP, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NOFFP, B), jnp.int32),
            jax.ShapeDtypeStruct((NOFFP, B), jnp.int32),
        ),
        interpret=interpret,
    )(a_pad, b_pad, la2, lb2)
    return mm[:n_off].T, mm50[:n_off].T


def analyze_pallas(seq1, len1, seq2, len2, diff_limit: int,
                   overlap_require: int, diff_pct: float,
                   interpret: bool = False):
    """OverlapAnalysis::analyze with the Pallas mismatch sweep (byte-exact
    for any input bytes, like the sequential-offset loop)."""
    B, L = seq1.shape
    len1 = len1.astype(jnp.int32)
    len2 = len2.astype(jnp.int32)
    rc2 = rc(seq2, len2)
    n_off = max(L - overlap_require, 1)
    # pad bytes beyond the read must not match each other: rc() zeroes
    # beyond len2 and reads keep raw bytes beyond len1, but every compare
    # is masked by (i < lb) & (t+i < la) inside the kernel.
    mm_f, mm50_f = mm_sweep(seq1, rc2, len1, len2, n_off, interpret)
    mm_b, mm50_b = mm_sweep(rc2, seq1, len2, len1, n_off, interpret)
    return _select_first_accept(mm_f, mm50_f, mm_b, mm50_b, len1, len2,
                                diff_limit, overlap_require, diff_pct, n_off)
