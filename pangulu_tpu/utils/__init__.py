from pangulu_tpu.utils.perf import PerfCounters
from pangulu_tpu.utils.log import get_logger


def device_sync(x):
    """Force completion of a device computation.

    ``block_until_ready`` is a NO-OP on some tunneled TPU backends
    (observed on the 'axon' platform), which silently breaks phase
    timing and completion guarantees.  A one-element scalar readback
    creates a true host-visible dependency on the producing
    computation.  Returns ``x``.
    """
    import jax
    import jax.numpy as jnp

    jax.device_get(jnp.ravel(x)[:1])
    return x


def enable_compilation_cache(path: str = "/tmp/pangulu_tpu_jax_cache"):
    """Persistent XLA compilation cache — amortizes jit compiles across
    processes (tests, bench, repeated solves)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


__all__ = ["PerfCounters", "get_logger", "enable_compilation_cache"]
