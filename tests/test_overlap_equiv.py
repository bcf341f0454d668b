import pytest

pytestmark = pytest.mark.slow
"""Property test: the vectorized overlap analysis equals a direct Python
port of the reference's sequential loop (src/overlapanalysis.cpp:16-93),
including the early-break/complete-compare-require quirk, on random pairs."""
import numpy as np
import jax.numpy as jnp

from fastp_tpu.ops import overlap as overlap_ops

COMP = {65: 84, 84: 65, 67: 71, 71: 67}


def ref_analyze(s1: bytes, s2: bytes, diff_limit: int, overlap_require: int,
                diff_pct: float):
    """Direct port of the reference loop for testing."""
    rc2 = bytes(COMP.get(c, 78) for c in reversed(s2))
    len1, len2 = len(s1), len(rc2)
    CCR = 50

    def scan(str1, str2, olen, limit):
        diff = 0
        i = 0
        broke = False
        for i in range(olen):
            if str1[i] != str2[i]:
                diff += 1
                if diff > limit and i < CCR:
                    broke = True
                    break
        i_end = i if broke else olen
        if not broke:
            if diff <= limit or (diff > limit and i_end > CCR):
                return diff
        return None

    offset = 0
    while offset < len1 - overlap_require:
        olen = min(len1 - offset, len2)
        limit = min(diff_limit, int(olen * diff_pct))
        d = scan(s1[offset:], rc2, olen, limit)
        if d is not None:
            return True, offset, olen, d
        offset += 1
    offset = 0
    while offset > -(len2 - overlap_require):
        olen = min(len1, len2 - abs(offset))
        limit = min(diff_limit, int(olen * diff_pct))
        d = scan(s1, rc2[-offset:], olen, limit)
        if d is not None:
            return True, offset, olen, d
        offset -= 1
    return False, 0, 0, 0


def test_overlap_equivalence_random():
    rng = np.random.default_rng(7)
    B, L = 64, 96
    bases = np.frombuffer(b"ACGT", np.uint8)
    cases = []
    for _ in range(B):
        insert = int(rng.integers(30, 2 * L))
        frag = bases[rng.integers(0, 4, insert)]
        rc = np.array([COMP[c] for c in frag[::-1]], np.uint8)
        l1 = int(rng.integers(40, L + 1))
        l2 = int(rng.integers(40, L + 1))
        r1 = frag[:l1] if insert >= l1 else np.concatenate(
            [frag, bases[rng.integers(0, 4, l1 - insert)]])
        r2 = rc[:l2] if insert >= l2 else np.concatenate(
            [rc, bases[rng.integers(0, 4, l2 - insert)]])
        # sprinkle errors
        for _ in range(int(rng.integers(0, 6))):
            r1[rng.integers(0, l1)] = bases[rng.integers(0, 4)]
        cases.append((r1[:l1].copy(), r2[:l2].copy()))

    b1 = np.zeros((B, L), np.uint8)
    b2 = np.zeros((B, L), np.uint8)
    l1a = np.zeros(B, np.int32)
    l2a = np.zeros(B, np.int32)
    for i, (r1, r2) in enumerate(cases):
        b1[i, :len(r1)] = r1
        b2[i, :len(r2)] = r2
        l1a[i] = len(r1)
        l2a[i] = len(r2)

    ov = overlap_ops.analyze(jnp.asarray(b1), jnp.asarray(l1a),
                             jnp.asarray(b2), jnp.asarray(l2a), 5, 30, 0.2)
    for i, (r1, r2) in enumerate(cases):
        want = ref_analyze(bytes(r1), bytes(r2), 5, 30, 0.2)
        got = (bool(ov["overlapped"][i]), int(ov["offset"][i]),
               int(ov["overlap_len"][i]), int(ov["diff"][i]))
        assert got == want, (i, got, want)
