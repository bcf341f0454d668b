"""Persistent XLA compilation cache setup.

jax 0.9.0 ignores the JAX_COMPILATION_CACHE_DIR environment variable, so the
config is applied programmatically on first use.  The jitted pipeline steps
take ~30-50s to compile against the TPU backend; the cache makes every
process after the first start warm.
"""
import os

_done = False


def ensure_compile_cache():
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("FASTP_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        path = os.environ.get(
            "FASTP_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "fastp_tpu_xla"))
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never fail the pipeline
        pass
