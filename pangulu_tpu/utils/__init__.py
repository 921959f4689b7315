from pangulu_tpu.utils.perf import PerfCounters
from pangulu_tpu.utils.log import get_logger


def enable_compilation_cache(path: str = "/tmp/pangulu_tpu_jax_cache"):
    """Persistent XLA compilation cache — amortizes jit compiles across
    processes (tests, bench, repeated solves)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


__all__ = ["PerfCounters", "get_logger", "enable_compilation_cache"]
