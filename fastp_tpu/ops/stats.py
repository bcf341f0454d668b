"""Per-cycle quality/content statistics (reference: src/stats.cpp:232-332).

stat_batch computes, for a batch of (possibly masked) reads, the same
accumulators Stats::statRead builds per read:
  cycle_q20/q30/content/qual[8, L], cycle_total_base/qual[L],
  qual_hist[128], kmer[1024], reads, length_sum.
Everything is a masked reduction over the batch axis -- bandwidth-bound on
TPU, no scalar loops.  K-mer counting replicates the reference's rolling
window including its N-handling (a 5-mer is counted at position i >= 4 iff
bases i-4..i are all ACGT).
"""
from __future__ import annotations

import jax.numpy as jnp

from .common import pos_iota, base_slot, base2val

Q20_CHAR = ord('5')
Q30_CHAR = ord('?')
KMER_BINS = 2 << 10  # mKmerBufLen = 2<<(5*2) = 2048 (only 1024 used by 10-bit keys)


def stat_batch(bases, quals, lengths, include):
    """include: bool[B] -- which reads contribute (e.g. post-filter pass).

    Returns a dict of accumulators (int32/int64-safe within one batch).
    """
    B, L = bases.shape
    rlen = lengths.astype(jnp.int32)
    pos = pos_iota(B, L)
    in_read = (pos < rlen[:, None]) & include[:, None]
    q = quals.astype(jnp.int32)
    slot = base_slot(bases)  # 0..7

    is_q30 = in_read & (q >= Q30_CHAR)
    is_q20 = in_read & (q >= Q20_CHAR)

    # one-hot over 8 slots -> [8, B, L] masked sums reduced over B
    oh = jnp.stack([(slot == s) & in_read for s in range(8)], axis=0)  # [8, B, L]
    ohf = oh.astype(jnp.int32)
    cycle_content = jnp.sum(ohf, axis=1)                                 # [8, L]
    cycle_q30 = jnp.sum(jnp.where(oh & is_q30[None], 1, 0), axis=1)
    cycle_q20 = jnp.sum(jnp.where(oh & is_q20[None], 1, 0), axis=1)
    cycle_qual = jnp.sum(jnp.where(oh, (q - 33)[None], 0), axis=1)

    cycle_total_base = jnp.sum(in_read.astype(jnp.int32), axis=0)        # [L]
    cycle_total_qual = jnp.sum(jnp.where(in_read, q - 33, 0), axis=0)    # [L]

    qual_hist = jnp.zeros((129,), jnp.int32).at[
        jnp.where(in_read, jnp.clip(q, 0, 127), 128).reshape(-1)
    ].add(1)[:128]

    # --- 5-mer counting ---
    val = base2val(bases)  # -1 for non-ACGT
    v = jnp.where(val >= 0, val, 0)
    ok = (val >= 0) & (pos < rlen[:, None])
    # kmer at position i uses bases i-4..i
    def shift(a, k, fill):
        return jnp.concatenate([jnp.full((B, k), fill, a.dtype), a[:, :L - k]], axis=1)
    kmer = v
    valid = ok
    for k in range(1, 5):
        kmer = kmer + (shift(v, k, 0) << (2 * k))
        valid = valid & shift(ok, k, False)
    valid = valid & (pos >= 4) & include[:, None]
    kidx = jnp.where(valid, kmer, KMER_BINS)
    kmer_counts = jnp.zeros((KMER_BINS + 1,), jnp.int32).at[
        kidx.reshape(-1)].add(1)[:KMER_BINS]

    reads = jnp.sum(include.astype(jnp.int32))
    length_sum = jnp.sum(jnp.where(include, rlen, 0))

    return {
        "cycle_q20": cycle_q20,
        "cycle_q30": cycle_q30,
        "cycle_content": cycle_content,
        "cycle_qual": cycle_qual,
        "cycle_total_base": cycle_total_base,
        "cycle_total_qual": cycle_total_qual,
        "qual_hist": qual_hist,
        "kmer": kmer_counts,
        "reads": reads,
        "length_sum": length_sum,
    }
