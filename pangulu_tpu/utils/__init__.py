from pangulu_tpu.utils.perf import PerfCounters
from pangulu_tpu.utils.log import get_logger


def device_sync(x):
    """Force completion of a device computation.

    ``block_until_ready`` is a NO-OP on some tunneled TPU backends
    (observed on the 'axon' platform), which silently breaks phase
    timing and completion guarantees.  A one-element scalar readback
    creates a true host-visible dependency on the producing
    computation.  Returns ``x``.

    NOTE: on a tunneled backend the readback itself costs a full
    host<->device round trip (~26 ms measured here) regardless of
    size.  Steady-state throughput must therefore be measured by
    timing K chained runs with ONE final sync (see bench.py), not by
    syncing every run.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])
    return x


def enable_compilation_cache(path: str = "/tmp/pangulu_tpu_jax_cache"):
    """Persistent XLA compilation cache — amortizes jit compiles across
    processes (tests, bench, repeated solves)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


__all__ = ["PerfCounters", "get_logger", "enable_compilation_cache"]
