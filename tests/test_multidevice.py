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
