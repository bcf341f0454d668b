"""fastp_tpu: TPU-native FASTQ preprocessing framework."""
import os

# Persistent XLA compilation cache: the jitted pipeline steps take ~30s to
# compile on TPU; caching makes every run after the first start instantly.
# Set FASTP_TPU_NO_COMPILE_CACHE=1 to disable. Must be configured before the
# first jax import in the process.
if not os.environ.get("FASTP_TPU_NO_COMPILE_CACHE"):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "fastp_tpu_xla"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
