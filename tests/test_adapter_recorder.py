"""Native adapter-count recorder vs the pure-Python dict path.

The recorder (fastq_native.cpp adrec_*) must reproduce FilterResult's
map semantics bit-exactly (reference: src/filterresult.cpp:115-183):
insertion caps at >20000 keys, low-complexity skip past >5000 keys, the
pair path's early return on a rejected NEW adapter1 key, and counter
updates that precede (and survive) map rejections.
"""
import numpy as np
import pytest

from fastp_tpu.io import native as native_mod
from fastp_tpu.report import filter_model
from fastp_tpu.report.filter_model import FilterResult
from fastp_tpu.config import Options

pytestmark = pytest.mark.skipif(native_mod.get_lib() is None,
                                reason="native lib unavailable")


def _mk_pair(with_native: bool) -> FilterResult:
    fr = FilterResult(Options(), paired=True)
    if not with_native:
        fr._adrec = None
    return fr


def _rand_mat(rng, n, w):
    return rng.integers(65, 85, size=(n, w), dtype=np.uint8)


def test_bulk_pairs_match_python_replay():
    rng = np.random.default_rng(7)
    B, W = 4096, 96
    ba1 = _rand_mat(rng, B, W)
    ba2 = _rand_mat(rng, B, W)
    rows = np.arange(B, dtype=np.int64)
    lo1 = rng.integers(0, 40, B).astype(np.int64)
    hi1 = lo1 + rng.integers(0, 30, B)          # includes empty slices
    lo2 = rng.integers(0, 40, B).astype(np.int64)
    hi2 = lo2 + rng.integers(0, 30, B)
    # force repeats so increments are exercised
    ba1[B // 2:] = ba1[:B // 2]
    ba2[B // 2:] = ba2[:B // 2]
    lo1[B // 2:] = lo1[:B // 2]
    hi1[B // 2:] = hi1[:B // 2]
    lo2[B // 2:] = lo2[:B // 2]
    hi2[B // 2:] = hi2[:B // 2]

    nat = _mk_pair(True)
    assert nat._adrec is not None
    assert nat.add_adapter_trimmed_pairs_bulk(ba1, lo1, hi1, ba2, lo2, hi2,
                                              rows)
    py = _mk_pair(False)
    for k in range(B):
        a1 = ba1[k, lo1[k]:hi1[k]].tobytes().decode("latin-1")
        a2 = ba2[k, lo2[k]:hi2[k]].tobytes().decode("latin-1")
        py.add_adapter_trimmed_pair(a1, a2)

    assert nat.adapter1 == py.adapter1
    assert nat.adapter2 == py.adapter2
    assert nat.trimmed_adapter_reads == py.trimmed_adapter_reads
    assert nat.trimmed_adapter_bases == py.trimmed_adapter_bases


def test_caps_and_low_complexity(monkeypatch):
    # shrink the caps so the test exercises both thresholds cheaply on
    # the PYTHON side; the native side uses the real constants, so build
    # enough keys to cross the real 5000/20000 thresholds instead
    rng = np.random.default_rng(3)
    n_keys = 26000
    W = 12
    ba1 = rng.integers(65, 91, size=(n_keys, W), dtype=np.uint8)
    # sprinkle low-complexity keys (runs of one letter) throughout
    ba1[::7, :] = 65
    ba2 = rng.integers(65, 91, size=(n_keys, W), dtype=np.uint8)
    rows = np.arange(n_keys, dtype=np.int64)
    z = np.zeros(n_keys, np.int64)
    w = np.full(n_keys, W, np.int64)

    nat = _mk_pair(True)
    assert nat.add_adapter_trimmed_pairs_bulk(ba1, z, w, ba2, z, w, rows)
    py = _mk_pair(False)
    for k in range(n_keys):
        py.add_adapter_trimmed_pair(ba1[k].tobytes().decode("latin-1"),
                                    ba2[k].tobytes().decode("latin-1"))
    assert nat.adapter1 == py.adapter1
    assert nat.adapter2 == py.adapter2
    # the cap actually engaged (map saturates just past MAX_ADAPTER_REC)
    assert len(py.adapter1) <= filter_model.MAX_ADAPTER_REC + 1
    assert len(py.adapter1) > filter_model.MAX_ADAPTER_REC - 1


def test_single_adds_and_state_dict_roundtrip():
    nat = _mk_pair(True)
    py = _mk_pair(False)
    seqs = ["ACGT", "ACGT", "A", "AAAAAA", "TTTTGGGGCCC", ""]
    for s in seqs:
        nat.add_adapter_trimmed(s, is_r2=False)
        py.add_adapter_trimmed(s, is_r2=False)
        nat.add_adapter_trimmed(s, is_r2=True, inc_trimmed_counter=False,
                                count=3)
        py.add_adapter_trimmed(s, is_r2=True, inc_trimmed_counter=False,
                               count=3)
    assert nat.adapter1 == py.adapter1
    assert nat.adapter2 == py.adapter2
    assert nat.trimmed_adapter_reads == py.trimmed_adapter_reads
    assert nat.trimmed_adapter_bases == py.trimmed_adapter_bases
    st = nat.state_dict()
    assert st["adapter1"] == py.adapter1
    # merge materializes and keeps accumulating correctly
    other = _mk_pair(True)
    other.add_adapter_trimmed("ACGT")
    other.merge_state(st)
    assert other.adapter1["ACGT"] == py.adapter1["ACGT"] + 1
