import os

# Run tests on a virtual 8-device CPU mesh; never touch real TPU from tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# the axon sitecustomize registers the TPU plugin (and wins over
# JAX_PLATFORMS) whenever PALLAS_AXON_POOL_IPS is set -- clear it
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
