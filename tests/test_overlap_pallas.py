"""Pallas overlap sweep equivalence vs the sequential-offset loop
(interpret mode; real-TPU execution exercised via FASTP_TPU_PALLAS_OVERLAP
on hardware)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from fastp_tpu.ops import overlap as ov
from fastp_tpu.ops.overlap_pallas import analyze_pallas


def _corpus(trial, B=64, L=96):
    # interpret-mode Mosaic executes the kernel in Python: cost scales with
    # B*L*offsets, so the case size is capped to keep the slow tier
    # finishable on a 1-core host (real-TPU execution runs the full sizes
    # via FASTP_TPU_PALLAS_OVERLAP=1 on hardware)
    rng = np.random.default_rng(trial)
    comp = np.zeros(256, np.uint8)
    for k, v in ((65, 84), (84, 65), (67, 71), (71, 67), (78, 78)):
        comp[k] = v
    len1 = rng.integers(40, L - 5, B).astype(np.int32)
    len2 = rng.integers(40, L - 5, B).astype(np.int32)
    s1 = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (B, L),
                    p=[.24, .24, .24, .24, .04])
    s2 = rng.choice(np.frombuffer(b"ACGT", np.uint8), (B, L))
    # plant real overlaps on even rows
    for i in range(0, B, 2):
        off = int(rng.integers(0, 40))
        l1, l2 = int(len1[i]), int(len2[i])
        olen = min(l1 - off, l2)
        if olen <= 0:
            continue
        for j in range(olen):
            s2[i, l2 - 1 - j] = comp[s1[i, off + j]]
        for _ in range(int(rng.integers(0, 4))):
            s2[i, int(rng.integers(0, l2))] = rng.choice(
                np.frombuffer(b"ACGT", np.uint8))
    pos = np.arange(L)
    s1[pos[None, :] >= len1[:, None]] = 0
    s2[pos[None, :] >= len2[:, None]] = 0
    return s1, len1, s2, len2


@pytest.mark.parametrize("trial", [0, 1])
def test_pallas_matches_loop(trial):
    s1, l1, s2, l2 = _corpus(trial)
    a = ov._analyze_loop(s1, l1, s2, l2, 5, 30, 0.2, False)
    b = analyze_pallas(s1, l1, s2, l2, 5, 30, 0.2, interpret=True)
    for k in ("overlapped", "offset", "overlap_len", "diff"):
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k
