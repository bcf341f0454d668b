"""`fastp_tpu test` -- quick built-in self tests mirroring `fastp test`
(reference: src/unittest.cpp:18-32)."""
from __future__ import annotations

import sys

import numpy as np


def run_self_tests() -> bool:
    import jax.numpy as jnp
    from .ops import trim as trim_ops
    from .ops import polyx as polyx_ops
    from .ops import overlap as overlap_ops
    from .ops.common import rc

    def enc(s):
        b = np.frombuffer(s.encode(), np.uint8)
        out = np.zeros((1, len(b)), np.uint8)
        out[0] = b
        return jnp.asarray(out), jnp.asarray(np.array([len(b)], np.int32))

    ok = True

    def check(name, cond):
        nonlocal ok
        print("%s: %s" % (name, "PASSED" if cond else "FAILED"))
        ok = ok and cond

    s, l = enc("AAAATTTTCCCCGGGG")
    out = rc(s, l)
    check("Sequence::reverseComplement",
          bytes(np.asarray(out)[0]).decode() == "CCCCGGGGAAAATTTT")

    seq = "ATTTTAAAAAAAAAATAAAAAAAAAAAAACAAAAAAAAAAAAAAAAAAAAAAAAAT"
    b, l = enc(seq)
    new_len, trimmed, poly, nbases = polyx_ops.trim_polyx(b, l, 10)
    check("PolyX::trimPolyX",
          bytes(np.asarray(b)[0, :int(new_len[0])]).decode() == "ATTTT"
          and int(nbases[0]) == 51)

    r1 = "CAGCGCCTACGGGCCCCTTTTTCTGCGCGACCGCGTGGCTGTGGGCGCGGATGCCTTTGAGCGCGGTGACTTCTCACTGCGTATCGAGC"
    r2 = "ACCTCCAGCGGCTCGATACGCAGTGAGAAGTCACCGCGCTCAAAGGCATCCGCGCCCACAGCCACGCGGTCGCGCAGAAAAAGGGGTCC"
    b1, l1 = enc(r1)
    b2, l2 = enc(r2)
    ov = overlap_ops.analyze(b1, l1, b2, l2, 2, 30, 0.2)
    check("OverlapAnalysis::analyze",
          bool(ov["overlapped"][0]) and int(ov["offset"][0]) == 10
          and int(ov["overlap_len"][0]) == 79 and int(ov["diff"][0]) == 1)

    print("\n==========================")
    print("ALL PASSED" if ok else "SOME FAILED")
    return ok
