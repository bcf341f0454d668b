"""Generate a synthetic PE FASTQ corpus for parity and benchmark testing.

Simulates Illumina-style reads: random genome fragments with configurable
insert-size distribution (short inserts produce adapter read-through),
3'-degrading quality, polyG tails on a fraction of reads (NovaSeq-style),
random N positions, and exact duplicates.
"""
import argparse
import gzip
import numpy as np

ADAPTER_R1 = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
ADAPTER_R2 = "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"
BASES = np.frombuffer(b"ACGT", np.uint8)
COMP = {65: 84, 84: 65, 67: 71, 71: 67, 78: 78}


def revcomp(seq: np.ndarray) -> np.ndarray:
    table = np.zeros(256, np.uint8)
    for k, v in COMP.items():
        table[k] = v
    return table[seq[::-1]]


def make_quals(rng, n, read_len, mean_hi=36, degrade=8):
    pos = np.arange(read_len)
    base_q = mean_hi - degrade * (pos / read_len) ** 2
    q = base_q[None, :] + rng.normal(0, 3, (n, read_len))
    q = np.clip(q, 2, 40).astype(np.uint8)
    return q + 33


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
    ap.add_argument("--novaseq-names", action="store_true", default=True)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    L = args.read_len
    n = args.reads
    a1 = np.frombuffer(ADAPTER_R1.encode(), np.uint8)
    a2 = np.frombuffer(ADAPTER_R2.encode(), np.uint8)

    o1 = gzip.open(args.out1, "wt") if args.out1.endswith(".gz") else open(args.out1, "w")
    o2 = gzip.open(args.out2, "wt") if args.out2.endswith(".gz") else open(args.out2, "w")

    recs = []
    i = 0
    while len(recs) < n:
        i += 1
        if recs and rng.random() < args.dup_rate:
            # exact duplicate of an earlier pair (different name)
            j = rng.integers(0, len(recs))
            s1, s2, q1, q2 = recs[j][0].copy(), recs[j][1].copy(), recs[j][2], recs[j][3]
            recs.append((s1, s2, q1, q2))
            continue
        if rng.random() < args.short_insert_rate:
            insert = int(rng.integers(40, L))
        else:
            insert = int(rng.integers(L, 2 * L + 100))
        frag = BASES[rng.integers(0, 4, insert)]
        r1 = np.zeros(L, np.uint8)
        r2 = np.zeros(L, np.uint8)
        fr2 = revcomp(frag)
        n1 = min(L, insert)
        r1[:n1] = frag[:n1]
        r2[:n1] = fr2[:n1]
        if insert < L:
            # adapter read-through
            rest = L - insert
            r1[insert:insert + min(rest, len(a1))] = a1[:min(rest, len(a1))]
            r2[insert:insert + min(rest, len(a2))] = a2[:min(rest, len(a2))]
            extra1 = L - insert - len(a1)
            if extra1 > 0:
                r1[insert + len(a1):] = BASES[rng.integers(0, 4, extra1)]
            extra2 = L - insert - len(a2)
            if extra2 > 0:
                r2[insert + len(a2):] = BASES[rng.integers(0, 4, extra2)]
        q1 = make_quals(rng, 1, L)[0]
        q2 = make_quals(rng, 1, L, mean_hi=34, degrade=10)[0]
        # sequencing errors where quality is low
        err1 = rng.random(L) < 10 ** (-(q1.astype(float) - 33) / 10)
        err2 = rng.random(L) < 10 ** (-(q2.astype(float) - 33) / 10)
        r1[err1] = BASES[rng.integers(0, 4, int(err1.sum()))]
        r2[err2] = BASES[rng.integers(0, 4, int(err2.sum()))]
        # Ns
        nm1 = rng.random(L) < args.n_rate
        nm2 = rng.random(L) < args.n_rate
        r1[nm1] = ord("N")
        r2[nm2] = ord("N")
        q1[nm1] = 33 + 2
        q2[nm2] = 33 + 2
        # polyG tails
        if rng.random() < args.polyg_rate:
            glen = int(rng.integers(10, 60))
            r1[L - glen:] = ord("G")
            r2[L - glen:] = ord("G")
        recs.append((r1, r2, q1, q2))

    prefix = "@A00123:45:HXXYZDSXX:1:1101" if args.novaseq_names else "@SIM001:1:FC:1:1101"
    for idx, (r1, r2, q1, q2) in enumerate(recs):
        name = "%s:%d:%d" % (prefix, 1000 + idx % 30000, 1000 + idx // 30000)
        o1.write("%s 1:N:0:ATCACGTT+GGTTCACC\n%s\n+\n%s\n"
                 % (name, r1.tobytes().decode(), q1.tobytes().decode()))
        o2.write("%s 2:N:0:ATCACGTT+GGTTCACC\n%s\n+\n%s\n"
                 % (name, r2.tobytes().decode(), q2.tobytes().decode()))
    o1.close()
    o2.close()
    print("wrote %d pairs to %s / %s" % (n, args.out1, args.out2))


if __name__ == "__main__":
    main()
