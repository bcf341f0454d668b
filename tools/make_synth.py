"""Generate a synthetic PE FASTQ corpus for parity and benchmark testing.

Simulates Illumina-style reads: random genome fragments with configurable
insert-size distribution (short inserts produce adapter read-through),
3'-degrading quality, polyG tails on a fraction of reads (NovaSeq-style),
random N positions, and exact duplicates.

Fully vectorized: generates ~1M pairs/min on one CPU core (chunked numpy),
so multi-million-read benchmark corpora are practical.
"""
import argparse
import gzip
import numpy as np

ADAPTER_R1 = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
ADAPTER_R2 = "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"
BASES = np.frombuffer(b"ACGT", np.uint8)

_COMP = np.zeros(256, np.uint8)
for _k, _v in ((65, 84), (84, 65), (67, 71), (71, 67), (78, 78)):
    _COMP[_k] = _v

CHUNK = 100_000


# NovaSeq/NextSeq RTA3 emit exactly four binned quality scores; modern
# FASTQ is overwhelmingly quality-binned, so the synthetic corpus bins too
# (pass --qual-bins none for legacy continuous qualities)
NOVA_BINS = np.array([2, 12, 23, 37], np.uint8)


def make_quals(rng, n, read_len, mean_hi=36, degrade=8, bins=NOVA_BINS):
    pos = np.arange(read_len)
    base_q = (mean_hi - degrade * (pos / read_len) ** 2).astype(np.float32)
    q = base_q[None, :] + 3.0 * rng.standard_normal((n, read_len),
                                                    dtype=np.float32)
    q = np.clip(q, 2, 40).astype(np.uint8)
    if bins is not None:
        # snap to the nearest bin (RTA3-style quantization)
        edges = (bins[:-1].astype(np.int32) + bins[1:]) // 2
        q = bins[np.searchsorted(edges, q, side="right")]
    return q + 33


def _gen_chunk(rng, n, L, args):
    """Vectorized generation of n pairs; returns (r1, r2, q1, q2) u8 arrays."""
    # insert sizes
    short = rng.random(n) < args.short_insert_rate
    insert = np.where(short,
                      rng.integers(40, L, n),
                      rng.integers(L, 2 * L + 100, n)).astype(np.int32)

    # fragment for every pair, generated wide enough for the R1 window
    frag = BASES[rng.integers(0, 4, (n, 2 * L + 100), dtype=np.uint8)]
    pos = np.arange(L)[None, :]
    in_ins = pos < insert[:, None]

    # r1 = frag[:L] inside the insert, adapter + random tail beyond
    a1 = np.frombuffer(ADAPTER_R1.encode(), np.uint8)
    a2 = np.frombuffer(ADAPTER_R2.encode(), np.uint8)

    def read_through(adapter):
        # beyond the insert: adapter bytes, then random fill
        ad_pad = np.zeros(L + 1, np.uint8)
        ad_pad[:len(adapter)] = adapter
        idx = np.clip(pos - insert[:, None], 0, L)
        tail = ad_pad[idx]
        fill = BASES[rng.integers(0, 4, (n, L), dtype=np.uint8)]
        beyond_ad = (pos - insert[:, None]) >= len(adapter)
        return np.where(beyond_ad, fill, tail)

    r1 = np.where(in_ins, frag[:, :L], read_through(a1))

    # r2 = revcomp(frag[:insert])[:L]: rc[j] = comp(frag[insert-1-j])
    ridx = insert[:, None] - 1 - pos
    r2_core = _COMP[np.take_along_axis(frag, np.clip(ridx, 0, frag.shape[1] - 1),
                                       axis=1)]
    r2 = np.where(in_ins, r2_core, read_through(a2))

    bins = None if args.qual_bins == "none" else NOVA_BINS
    q1 = make_quals(rng, n, L, bins=bins)
    q2 = make_quals(rng, n, L, mean_hi=34, degrade=10, bins=bins)

    # sequencing errors where quality is low (per-qual error prob via LUT)
    perr = np.zeros(256, np.float32)
    qv = np.arange(256, dtype=np.float32)
    perr[:] = 10.0 ** (-(qv - 33) / 10)
    for r, q in ((r1, q1), (r2, q2)):
        err = rng.random((n, L), dtype=np.float32) < perr[q]
        r[err] = BASES[rng.integers(0, 4, int(err.sum()), dtype=np.uint8)]

    # Ns
    for r, q in ((r1, q1), (r2, q2)):
        nm = rng.random((n, L), dtype=np.float32) < args.n_rate
        r[nm] = ord("N")
        q[nm] = 33 + 2

    # polyG tails
    pg = rng.random(n) < args.polyg_rate
    glen = rng.integers(10, 60, n)
    gm = pg[:, None] & (pos >= (L - glen)[:, None])
    r1[gm] = ord("G")
    r2[gm] = ord("G")

    # exact duplicates: overwrite dup rows with earlier rows
    dup = np.flatnonzero(rng.random(n) < args.dup_rate)
    dup = dup[dup > 0]
    src = (rng.random(len(dup)) * dup).astype(np.int64)
    r1[dup] = r1[src]
    r2[dup] = r2[src]
    q1[dup] = q1[src]
    q2[dup] = q2[src]
    return r1, r2, q1, q2


def _emit_fixed(fh, prefix, start, reads, quals, tag):
    """Vectorized emit: every record is fixed-width (zero-padded x:y name
    coordinates), so the whole chunk serializes as one [m, W] u8 matrix."""
    m, L = reads.shape
    i = np.arange(start, start + m, dtype=np.int64)
    x = 10000 + i % 30000
    y = 10000 + i // 30000
    head_w = len(prefix) + 5 + 1 + 5 + len(tag)
    W = head_w + L + 3 + L + 1
    rec = np.empty((m, W), np.uint8)
    rec[:, :len(prefix)] = np.frombuffer(prefix, np.uint8)
    c = len(prefix)
    for d in range(5):
        rec[:, c + d] = 48 + (x // 10 ** (4 - d)) % 10
        rec[:, c + 6 + d] = 48 + (y // 10 ** (4 - d)) % 10
    rec[:, c + 5] = ord(":")
    rec[:, c + 11:head_w] = np.frombuffer(tag, np.uint8)
    rec[:, head_w:head_w + L] = reads
    rec[:, head_w + L:head_w + L + 3] = np.frombuffer(b"\n+\n", np.uint8)
    rec[:, head_w + L + 3:W - 1] = quals
    rec[:, -1] = ord("\n")
    fh.write(rec.tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=20000)
    ap.add_argument("--read-len", type=int, default=151)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out1", default="synth_R1.fq")
    ap.add_argument("--out2", default="synth_R2.fq")
    ap.add_argument("--dup-rate", type=float, default=0.05)
    ap.add_argument("--polyg-rate", type=float, default=0.08)
    ap.add_argument("--n-rate", type=float, default=0.002)
    ap.add_argument("--short-insert-rate", type=float, default=0.25)
    ap.add_argument("--qual-bins", choices=["nova4", "none"], default="nova4",
                    help="nova4 = RTA3-style 4-bin quality quantization "
                         "(modern Illumina); none = continuous 2-40")
    ap.add_argument("--novaseq-names", action="store_true", default=True)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    L = args.read_len
    n = args.reads

    def opener(p):
        return gzip.open(p, "wb") if p.endswith(".gz") else open(p, "wb")

    o1 = opener(args.out1)
    o2 = opener(args.out2)
    prefix = b"@A00123:45:HXXYZDSXX:1:1101" if args.novaseq_names \
        else b"@SIM001:1:FC:1:1101"

    prefix = prefix + b":"
    done = 0
    while done < n:
        m = min(CHUNK, n - done)
        r1, r2, q1, q2 = _gen_chunk(rng, m, L, args)
        _emit_fixed(o1, prefix, done, r1, q1, b" 1:N:0:ATCACGTT+GGTTCACC\n")
        _emit_fixed(o2, prefix, done, r2, q2, b" 2:N:0:ATCACGTT+GGTTCACC\n")
        done += m
    o1.close()
    o2.close()
    print("wrote %d pairs to %s / %s" % (n, args.out1, args.out2))


if __name__ == "__main__":
    main()
