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

# Keep <=64MB allocations in the glibc main arena (M_MMAP_THRESHOLD=-3):
# by default glibc mmap()s buffers >128KB and munmap()s them on free, so
# every batch's chunk/array temporaries re-page-fault from scratch —
# measured ~30us/page on virtualized hosts (~16ms per fresh 11MB chunk).
# Arena reuse keeps the pages resident across batches.
try:
    import ctypes as _ctypes
    _ctypes.CDLL(None).mallopt(-3, 64 << 20)
except Exception:
    pass
