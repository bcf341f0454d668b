"""Multi-device data-parallel correctness: running the pipeline sharded
over the 8-device CPU mesh must produce byte-identical FASTQ and JSON to
the single-device goldens (reference semantics are device-count-invariant;
stats merge via replicated out_shardings = psum over the mesh,
fastp_tpu/parallel/mesh.py).
"""
import os

import pytest

from test_parity import R1, R2, run_cli, compare_dir

pytestmark = pytest.mark.skipif(not os.path.exists(R1),
                                reason="reference testdata not available")


def test_cfg2_pe_default_8dev(tmp_path):
    run_cli(tmp_path, ["-i", R1, "-I", R2, "-o", "out1.fq", "-O", "out2.fq",
                       "--devices", "8"])
    compare_dir(tmp_path, "cfg2_pe_default", ["out1.fq", "out2.fq", "fastp.json"])


def test_cfg3_pe_correction_8dev(tmp_path):
    run_cli(tmp_path, ["-i", R1, "-I", R2, "-o", "out1.fq", "-O", "out2.fq",
                       "--correction", "--cut_right", "--devices", "8"])
    compare_dir(tmp_path, "cfg3_pe_correction", ["out1.fq", "out2.fq", "fastp.json"])


def test_cfg1_se_default_4dev(tmp_path):
    run_cli(tmp_path, ["-i", R1, "-o", "out.fq", "--devices", "4"])
    compare_dir(tmp_path, "cfg1_se_default", ["out.fq", "fastp.json"])


@pytest.mark.slow
def test_lean_dedup_index_filter_8dev(tmp_path):
    """Aux-arg synthesis under sharding: a lean-eligible config where the
    dedup verdicts and index-filter drops ride real (non-synthesized) H2D
    aux args (device.py:aux_arg_names/make_aux) must be byte-identical on
    an 8-device mesh vs 1 device — the mesh path disables the accumulator
    and unpacks result_hist from the replicated per-read stats blob."""
    import subprocess
    import sys
    from test_parity import normalize_json, ROOT
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "tools", "make_synth.py"),
                    "--reads", "1200", "--dup-rate", "0.2", "--seed", "23",
                    "--out1", str(tmp_path / "R1.fq"),
                    "--out2", str(tmp_path / "R2.fq")],
                   check=True, capture_output=True)
    # every 7th pair gets a blacklisted index1 so the index-filter mask
    # carries real drops (the synth corpus shares one index otherwise)
    for name in ("R1.fq", "R2.fq"):
        p = tmp_path / name
        lines = p.read_bytes().split(b"\n")
        for r in range(0, 1200, 7):
            lines[4 * r] = lines[4 * r].replace(b"ATCACGTT", b"CCCCCCCC")
        p.write_bytes(b"\n".join(lines))
    bl = tmp_path / "index1.txt"
    bl.write_text("CCCCCCCC\n")
    args = ["-i", str(tmp_path / "R1.fq"), "-I", str(tmp_path / "R2.fq"),
            "-o", "out1.fq", "-O", "out2.fq",
            "--dedup", "--filter_by_index1", str(bl),
            "--correction", "--cut_right"]
    d1 = tmp_path / "dev1"
    d8 = tmp_path / "dev8"
    d1.mkdir()
    d8.mkdir()
    run_cli(d1, args + ["--devices", "1"])
    run_cli(d8, args + ["--devices", "8"])
    for f in ("out1.fq", "out2.fq"):
        with open(d1 / f, "rb") as a, open(d8 / f, "rb") as b:
            assert a.read() == b.read(), "mesh output differs in %s" % f
    with open(d1 / "fastp.json") as a, open(d8 / "fastp.json") as b:
        assert normalize_json(a.read()) == normalize_json(b.read())
    # sanity: the blacklist actually dropped reads (index aux was live)
    import json as _json
    with open(d1 / "fastp.json") as f:
        rep = _json.load(f)
    assert rep["summary"]["before_filtering"]["total_reads"] > \
        rep["summary"]["after_filtering"]["total_reads"]


@pytest.mark.slow
def test_rowwise_correction_overflow_8dev(tmp_path, monkeypatch):
    """Per-row correction-delta OVERFLOW on the mesh path: with
    FASTP_TPU_CORR_K=1 every row with >=2 corrections exceeds the K slots
    and must take the exact host recompute
    (pe_runner._patch_corrections_rowwise / PairWindowView rowwise branch);
    output must stay byte-identical to the 1-device run."""
    import subprocess
    import sys
    from test_parity import normalize_json, ROOT
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "tools", "make_synth.py"),
                    "--reads", "1500", "--seed", "31",
                    "--out1", str(tmp_path / "R1.fq"),
                    "--out2", str(tmp_path / "R2.fq")],
                   check=True, capture_output=True)
    args = ["-i", str(tmp_path / "R1.fq"), "-I", str(tmp_path / "R2.fq"),
            "-o", "out1.fq", "-O", "out2.fq", "--correction", "--cut_right"]
    d1 = tmp_path / "dev1"
    d8 = tmp_path / "dev8"
    d1.mkdir()
    d8.mkdir()
    run_cli(d1, args + ["--devices", "1"])
    monkeypatch.setenv("FASTP_TPU_CORR_K", "1")
    run_cli(d8, args + ["--devices", "8"])
    for f in ("out1.fq", "out2.fq"):
        with open(d1 / f, "rb") as a, open(d8 / f, "rb") as b:
            assert a.read() == b.read(), \
                "rowwise overflow output differs in %s" % f
    with open(d1 / "fastp.json") as a, open(d8 / "fastp.json") as b:
        assert normalize_json(a.read()) == normalize_json(b.read())
