"""host_analyze_overlap (the sparse-correction overflow fallback) must
reproduce the device's ungapped overlap scan bit-for-bit, and the forced-
overflow end-to-end run must still byte-match the reference golden.

The lean device step keeps the five per-read overlap fields on device and
ships a 1-bit corr_able flag instead (pipeline/device.py); on sparse-list
overflow the host re-derives (offset, overlap_len) per flagged row with
hostview.host_analyze_overlap (reference: src/overlapanalysis.cpp:16-116).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_parity import R1, R2, compare_dir, run_cli

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RNG = np.random.default_rng(7)
_COMP = {65: 84, 84: 65, 67: 71, 71: 67}


def _rc(seq: np.ndarray) -> np.ndarray:
    return np.array([_COMP.get(int(c), 78) for c in seq[::-1]], np.uint8)


def _make_pair(L: int, insert: int, err: int):
    """A PE pair from one synthetic insert: R1 = insert prefix, R2 = rc of
    insert suffix, plus `err` random mismatches on R2."""
    ins_len = max(insert, 1)
    ins = RNG.integers(0, 4, ins_len)
    ins = np.array([65, 67, 71, 84], np.uint8)[ins]
    r1 = ins[:L] if ins_len >= L else np.concatenate(
        [ins, RNG.choice(np.array([65, 67, 71, 84], np.uint8), L - ins_len)])
    r2src = ins[-L:] if ins_len >= L else ins
    r2 = _rc(r2src)
    if len(r2) < L:
        r2 = np.concatenate(
            [r2, RNG.choice(np.array([65, 67, 71, 84], np.uint8), L - len(r2))])
    for _ in range(err):
        p = RNG.integers(0, len(r2))
        r2[p] = RNG.choice(np.array([65, 67, 71, 84], np.uint8))
    return r1[:L], r2[:L]


def test_host_analyze_matches_device_loop():
    from fastp_tpu.ops.overlap import _analyze_loop
    from fastp_tpu.pipeline.hostview import host_analyze_overlap

    B, L = 48, 96
    diff_limit, ov_req, dpct = 5, 30, 0.2
    b1 = np.zeros((B, L), np.uint8)
    b2 = np.zeros((B, L), np.uint8)
    l1 = np.zeros(B, np.int32)
    l2 = np.zeros(B, np.int32)
    for i in range(B):
        n1 = int(RNG.integers(ov_req + 1, L + 1))
        n2 = int(RNG.integers(ov_req + 1, L + 1))
        kind = i % 4
        if kind == 0:      # long insert: partial or no overlap
            r1, r2 = _make_pair(L, int(RNG.integers(L, 2 * L)), 2)
        elif kind == 1:    # short insert: read-through (negative offsets)
            r1, r2 = _make_pair(L, int(RNG.integers(ov_req, L)), 1)
        elif kind == 2:    # exact overlap, no errors
            r1, r2 = _make_pair(L, int(RNG.integers(ov_req, 2 * L)), 0)
        else:              # random noise, usually no overlap
            acgt = np.array([65, 67, 71, 84], np.uint8)
            r1 = RNG.choice(acgt, L)
            r2 = RNG.choice(acgt, L)
        b1[i, :n1] = r1[:n1]
        b2[i, :n2] = r2[:n2]
        l1[i], l2[i] = n1, n2

    dev = _analyze_loop(b1, l1, b2, l2, diff_limit, ov_req, dpct, False)
    dev = {k: np.asarray(v) for k, v in dev.items()}
    for i in range(B):
        found, off, ol, diff = host_analyze_overlap(
            b1[i, :l1[i]], b2[i, :l2[i]], diff_limit, ov_req, dpct)
        assert found == bool(dev["overlapped"][i]), i
        if found:
            assert (off, ol, diff) == (int(dev["offset"][i]),
                                       int(dev["overlap_len"][i]),
                                       int(dev["diff"][i])), i


@pytest.mark.slow
def test_corr_overflow_forced_byte_parity(tmp_path):
    """FASTP_TPU_CORR_CAP=2 forces every batch onto the overflow fallback
    (corr_able bit + host_analyze_overlap + host_correct_pair); output must
    be byte-identical to the default sparse-delta path on an error-bearing
    synthetic corpus."""
    import json
    import re

    r1 = str(tmp_path / "R1.fq")
    r2 = str(tmp_path / "R2.fq")
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "make_synth.py"),
                    "--reads", "1500", "--out1", r1, "--out2", r2,
                    "--seed", "11"], check=True)
    args = ["-i", r1, "-I", r2, "--correction", "--cut_right",
            "-a", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA",
            "--adapter_sequence_r2", "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"]

    ref_dir = tmp_path / "default"
    ovf_dir = tmp_path / "overflow"
    ref_dir.mkdir()
    ovf_dir.mkdir()
    run_cli(ref_dir, args + ["-o", "out1.fq", "-O", "out2.fq"])
    os.environ["FASTP_TPU_CORR_CAP"] = "2"
    try:
        run_cli(ovf_dir, args + ["-o", "out1.fq", "-O", "out2.fq"])
    finally:
        del os.environ["FASTP_TPU_CORR_CAP"]

    # the corpus must actually overflow a 2-slot list or the test is vacuous
    rep = json.loads((ref_dir / "fastp.json").read_text())
    assert rep["filtering_result"]["corrected_bases"] > 2

    norm = lambda t: re.sub(r'\t"command": ".*"', "C", t)
    for f in ("out1.fq", "out2.fq"):
        assert (ovf_dir / f).read_bytes() == (ref_dir / f).read_bytes(), f
    assert (norm((ovf_dir / "fastp.json").read_text())
            == norm((ref_dir / "fastp.json").read_text()))
