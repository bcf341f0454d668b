import os

# Run tests on a virtual 8-device CPU mesh; never touch real TPU from tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# the axon sitecustomize imports jax and registers the TPU plugin at
# INTERPRETER STARTUP whenever PALLAS_AXON_POOL_IPS is set, so jax has
# already latched the startup JAX_PLATFORMS before this file runs and
# the env assignment above is too late.  In-process jit then runs on the
# tunneled TPU and pays its program-load/claim lottery randomly per test
# (measured: the same 2s test taking 74-649s with near-zero CPU).  The
# LIVE config update below de-latches it — jax.config wins over the
# stale env snapshot as long as no backend has been initialized yet,
# which is guaranteed here because conftest imports precede collection.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# CLI subprocess tests default to ONE device: mesh byte-parity has its own
# dedicated tests (test_multidevice passes --devices explicitly), and an
# 8-way forced-host-device mesh on this 1-core host both multiplies compute
# 8x and flakes XLA:CPU's 40s collective-rendezvous timeout under load.
os.environ.setdefault("FASTP_TPU_DEVICES", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

if "jax" in sys.modules:  # sitecustomize pre-imported jax: de-latch
    import jax
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache for tests that import ops directly (the
# pipeline enables it via fastp_tpu.pipeline.device; per-op golden tests
# would otherwise recompile their sweeps on every run, which dominates the
# slow tier's wall time on this 1-core host).
from fastp_tpu._jaxcache import ensure_compile_cache
ensure_compile_cache()

# The byte-parity tests invoke the CLI with /tmp/refbuild/testdata paths
# because the recorded goldens embed those command strings.  /tmp does not
# survive between sessions while the vendored fixtures in tests/testdata do
# (byte-identical copies) -- materialize the expected layout on demand so
# the golden tests never skip just because /tmp was wiped.
_REFDATA = "/tmp/refbuild/testdata"
if not os.path.exists(os.path.join(_REFDATA, "R1.fq")):
    import shutil
    os.makedirs(_REFDATA, exist_ok=True)
    _here = os.path.dirname(os.path.abspath(__file__))
    for _f in ("R1.fq", "R2.fq"):
        shutil.copyfile(os.path.join(_here, "testdata", _f),
                        os.path.join(_REFDATA, _f))
