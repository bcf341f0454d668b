"""2-process jax.distributed run: per-host input byte-range shards,
per-shard outputs, gathered stats -> ONE merged JSON equal to the
single-process golden (fastp_tpu/parallel/multihost.py).
"""
import os
import socket
import subprocess
import sys

import pytest

from test_parity import (R1, R2, GOLDEN, ROOT, normalize_json)

pytestmark = pytest.mark.skipif(not os.path.exists(R1),
                                reason="reference testdata not available")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(tmpdir, args, port, pid, nprocs):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["FASTP_TPU_FS_EXCHANGE"] = "1"  # same machine => shared FS
    env["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:%d" % port
    env["JAX_NUM_PROCESSES"] = str(nprocs)
    env["JAX_PROCESS_ID"] = str(pid)
    cmd = [sys.executable, "-m", "fastp_tpu"] + args
    return subprocess.Popen(cmd, cwd=str(tmpdir), env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)


def test_two_process_pe(tmp_path):
    port = _free_port()
    args = ["-i", R1, "-I", R2, "-o", "out1.fq", "-O", "out2.fq"]
    procs = [_launch(tmp_path, args, port, k, 2) for k in range(2)]
    for p in procs:
        _, err = p.communicate(timeout=900)
        assert p.returncode == 0, err.decode(errors="replace")[-4000:]

    gdir = os.path.join(GOLDEN, "cfg2_pe_default")
    for out in ("out1.fq", "out2.fq"):
        got = b""
        for k in (1, 2):
            shard = os.path.join(str(tmp_path), "%04d.%s" % (k, out))
            assert os.path.exists(shard), "missing shard %s" % shard
            with open(shard, "rb") as f:
                got += f.read()
        with open(os.path.join(gdir, out), "rb") as f:
            want = f.read()
        assert got == want, "concatenated shards differ from golden %s" % out

    with open(os.path.join(str(tmp_path), "fastp.json")) as f:
        got_json = f.read()
    with open(os.path.join(gdir, "fastp.json")) as f:
        want_json = f.read()

    def norm(t):
        # per-host Bloom filters don't collapse cross-shard duplicates, so
        # the duplication rate is a documented approximation in multi-host
        # mode (fastp_tpu/parallel/multihost.py docstring)
        import re
        return re.sub(r'"rate": [0-9.eE+-]+', '"rate": X',
                      normalize_json(t))

    assert norm(got_json) == norm(want_json)
