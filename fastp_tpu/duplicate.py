"""Duplication profiling / deduplication
(reference: src/duplicate.cpp:7-173).

The reference hashes the whole (pair-concatenated) sequence with
position-indexed prime multipliers into 1-3 Bloom-filter bit buffers whose
sizes are powers of two, using first-arrival-wins test-and-set.  The quirk
that `isDup` keeps only the LAST buffer's result
(src/duplicate.cpp:154-167: `isDup = (ret & byte) != 0` inside the loop,
not &&=) is replicated.

Order within a batch follows input order, matching a single-worker
reference run (-w 1); the multi-threaded reference is itself
nondeterministic here.

Implemented with vectorized numpy on the host: hashing is a masked
gather/multiply/sum over [B, 2L] int64 (sums stay < 2^44, no overflow),
and first-wins semantics use stable sorts per batch.
"""
from __future__ import annotations

import numpy as np

from .config import Options

PRIME_ARRAY_LEN = 1 << 9

_BASE_CODE = np.full(256, 13, np.int64)
_BASE_CODE[ord("A")] = 7
_BASE_CODE[ord("T")] = 222
_BASE_CODE[ord("C")] = 74
_BASE_CODE[ord("G")] = 31
_BASE_CODE_F = _BASE_CODE.astype(np.float64)


import threading

# Bloom-buffer pool for resident-server processes: faulting in ~1 GB of
# fresh zero pages costs ~0.4 s on every job's first batches; recycled
# buffers are re-zeroed off the critical path when the filter is released.
# Only ONE size class is retained (the most recent) so a server cycling
# through accuracy levels doesn't accumulate every configuration's peak.
_buf_pool = {}
_buf_pool_lock = threading.Lock()
_BUF_POOL_MAX = 3  # buffers kept per size (accuracy 6 uses 3)


def _madv_huge(b: np.ndarray) -> np.ndarray:
    """MADV_HUGEPAGE (14) the filter buffer.  Free when THP is granted
    (2MB faults instead of 4KB, plus fewer TLB misses on the random
    probes); a no-op where the hypervisor never assembles huge pages
    (AnonHugePages stays 0 on this host).  Deliberately NOT an eager
    b[:]=0 commit: on virtualized hosts with 60-450us write faults,
    committing 768MB up-front costs 90-180s PER PROCESS, while lazy
    np.zeros pages fault only where a bit is actually set and unwritten
    pages read through the shared zero page for free."""
    try:
        import ctypes
        libc = ctypes.CDLL(None, use_errno=True)
        addr = b.ctypes.data
        a0 = (addr + 4095) & ~4095
        ln = b.nbytes - (a0 - addr)
        if ln > 0:
            libc.madvise(ctypes.c_void_p(a0), ctypes.c_size_t(ln), 14)
    except Exception:
        pass
    return b


def _acquire_buf(n_bytes: int) -> np.ndarray:
    with _buf_pool_lock:
        lst = _buf_pool.get(n_bytes)
        if lst:
            return lst.pop()
    return _madv_huge(np.zeros(n_bytes, np.uint8))


def _release_bufs(bufs) -> None:
    def rezero():
        for b in bufs:
            b[:] = 0
            with _buf_pool_lock:
                for size in list(_buf_pool):
                    if size != b.nbytes:
                        del _buf_pool[size]
                lst = _buf_pool.setdefault(b.nbytes, [])
                if len(lst) < _BUF_POOL_MAX:
                    lst.append(b)

    threading.Thread(target=rezero, daemon=True).start()


_prime_cache = {}


def _gen_primes(count: int) -> np.ndarray:
    """reference: src/duplicate.cpp:66-84 (10000-stride prime walk).
    Memoized: a resident server creates one Duplicate per job."""
    if count in _prime_cache:
        return _prime_cache[count]
    out = np.zeros(count, np.uint64)
    number = 10000
    found = 0
    while found < count:
        number += 1
        is_prime = True
        i = 2
        while i * i <= number:
            if number % i == 0:
                is_prime = False
                break
            i += 1
        if is_prime:
            out[found] = number
            found += 1
            number += 10000
    _prime_cache[count] = out
    return out


class Duplicate:
    def __init__(self, opt: Options, precomputed: "np.ndarray" = None,
                 hash_only: bool = False):
        """precomputed: per-record dup verdicts resolved ahead of time (the
        exact multi-host exchange, parallel/multihost.py) — no Bloom
        buffers are allocated and check_batch_* replays the verdicts in
        record order.  hash_only: expose the hash without buffers (the
        multi-host pre-pass)."""
        self.opt = opt
        buf_len_bytes = 1 << 29
        buf_num = 2
        lvl = opt.duplicate.accuracyLevel
        if lvl == 2:
            buf_len_bytes *= 2
        elif lvl == 3:
            buf_len_bytes *= 2
            buf_num *= 2
        elif lvl == 4:
            buf_len_bytes *= 4
            buf_num *= 2
        elif lvl == 5:
            buf_len_bytes *= 8
            buf_num *= 2
        elif lvl == 6:
            buf_len_bytes *= 8
            buf_num *= 3
        self.buf_len_bytes = buf_len_bytes
        self.buf_num = buf_num
        self.buf_len_bits = buf_len_bytes << 3
        self.offset_mask = PRIME_ARRAY_LEN * buf_num - 1
        self._pre = precomputed
        self._pre_off = 0
        if precomputed is None and not hash_only:
            self.bufs = [_acquire_buf(buf_len_bytes) for _ in range(buf_num)]
        else:
            self.bufs = []
        self.primes = _gen_primes(buf_num * PRIME_ARRAY_LEN).astype(np.int64)
        self.total_reads = 0
        self.dup_reads = 0
        self._gmat_cache = {}

    def _replay(self, B: int) -> np.ndarray:
        """Consume the next B precomputed verdicts (record order)."""
        v = self._pre[self._pre_off:self._pre_off + B]
        self._pre_off += B
        if len(v) < B:  # defensive: shorter pre-pass (should not happen)
            v = np.pad(v, (0, B - len(v)))
        dup = v.astype(bool)
        self.total_reads += B
        self.dup_reads += int(dup.sum())
        return dup

    def _prime_matrix(self, W: int) -> np.ndarray:
        """[W, buf_num] float64 prime multipliers (cached per width)."""
        cached = self._gmat_cache.get(W)
        if cached is not None:
            return cached
        x = np.arange(W, dtype=np.int64)
        G = np.empty((W, self.buf_num), np.float64)
        for i in range(self.buf_num):
            G[:, i] = self.primes[(x * self.buf_num + i) & self.offset_mask]
        self._gmat_cache[W] = G
        return G

    def _hash_positions(self, concat: np.ndarray, total_len: np.ndarray) -> np.ndarray:
        """concat: uint8[B, W] pair-concatenated sequences (0 pad);
        total_len: int32[B]. Returns positions int64[buf_num, B].

        Every term (code+pos)*prime is < 2^34 and the row sums stay < 2^44,
        so the whole hash is exact in float64 — one BLAS dgemm instead of
        per-buffer int64 broadcasting (~50x faster on the host)."""
        B, W = concat.shape
        codes = _BASE_CODE_F[concat]  # float64 [B, W]
        x = np.arange(W, dtype=np.float64)[None, :]
        mask = np.arange(W)[None, :] < total_len[:, None]
        vals = (codes + x) * mask
        sums = vals @ self._prime_matrix(W)  # [B, buf_num], exact integers
        return (sums.T.astype(np.int64)) % self.buf_len_bits

    def _apply(self, positions: np.ndarray) -> np.ndarray:
        """Test-and-set with first-wins order within the batch.
        Returns isDup bool[B] (last buffer's verdict, per the reference)."""
        from .io import native as native_mod
        lib = native_mod.get_lib()
        if lib is not None:
            B = positions.shape[1]
            is_dup = np.zeros(B, np.uint8)
            for i in range(self.buf_num):
                lib.dup_apply(self.bufs[i],
                              np.ascontiguousarray(positions[i]), B, is_dup)
            return is_dup.astype(bool)
        B = positions.shape[1]
        is_dup = np.zeros(B, bool)
        for i in range(self.buf_num):
            pos = positions[i]
            byte_pos = pos >> 3
            bit = (1 << (pos & 7)).astype(np.uint8)
            pre_set = (self.bufs[i][byte_pos] & bit) != 0
            # first occurrence within batch: stable unique on (byte_pos, bit)
            key = pos  # bit identity == full bit position
            order = np.argsort(key, kind="stable")
            sorted_key = key[order]
            dup_in_batch_sorted = np.zeros(B, bool)
            dup_in_batch_sorted[1:] = sorted_key[1:] == sorted_key[:-1]
            dup_in_batch = np.zeros(B, bool)
            dup_in_batch[order] = dup_in_batch_sorted
            is_dup = pre_set | dup_in_batch  # last buffer wins (reference quirk)
            np.bitwise_or.at(self.bufs[i], byte_pos, bit)
        return is_dup

    def _native_hash(self, b1, l1, b2=None, l2=None):
        """C++ single-pass hash (no concat materialization); falls back to
        the BLAS float64 path when the native library is unavailable."""
        from .io import native as native_mod
        if native_mod.get_lib() is None:
            return None
        return native_mod.dup_hash(b1, l1, b2, l2, self.primes,
                                   self.offset_mask, self.buf_num,
                                   self.buf_len_bits)

    def hash_positions_se(self, bases: np.ndarray,
                          lengths: np.ndarray) -> np.ndarray:
        """[buf_num, B] bit positions (the multi-host pre-pass uses the
        LAST buffer's row: only it decides the verdict, per the reference's
        isDup overwrite quirk)."""
        pos = self._native_hash(bases, lengths)
        if pos is None:
            pos = self._hash_positions(bases, lengths)
        return pos

    def hash_positions_pe(self, b1, l1, b2, l2) -> np.ndarray:
        B, L = b1.shape
        pos = self._native_hash(b1, l1, b2, l2)
        if pos is None:
            W = 2 * L
            concat = np.zeros((B, W), np.uint8)
            concat[:, :L] = b1
            x = np.arange(L)
            for_rows = l1[:, None] + x[None, :]
            np.put_along_axis(concat, np.minimum(for_rows, W - 1), np.where(
                x[None, :] < l2[:, None], b2, 0), axis=1)
            pos = self._hash_positions(concat, (l1 + l2).astype(np.int32))
        return pos

    def check_batch_se(self, bases: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        if self._pre is not None:
            return self._replay(len(lengths))
        dup = self._apply(self.hash_positions_se(bases, lengths))
        self.total_reads += len(lengths)
        self.dup_reads += int(dup.sum())
        return dup

    def check_batch_pe(self, b1: np.ndarray, l1: np.ndarray,
                       b2: np.ndarray, l2: np.ndarray) -> np.ndarray:
        """Pair hash = seq2intvector(r1) then seq2intvector(r2, posOffset=len1),
        equivalent to hashing the concatenated pair."""
        if self._pre is not None:
            return self._replay(len(l1))
        dup = self._apply(self.hash_positions_pe(b1, l1, b2, l2))
        self.total_reads += len(l1)
        self.dup_reads += int(dup.sum())
        return dup

    def get_dup_rate(self) -> float:
        if self.total_reads == 0:
            return 0.0
        return self.dup_reads / self.total_reads

    def release(self) -> None:
        """Return the bit buffers to the process-wide pool (re-zeroed on a
        background thread); the filter must not be used afterwards."""
        bufs, self.bufs = self.bufs, []
        _release_bufs(bufs)
