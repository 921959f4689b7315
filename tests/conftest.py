import os

# NOTE: in this environment jax is pre-imported at interpreter startup,
# so JAX_PLATFORMS/XLA_FLAGS set here via os.environ would be too late.
# Use jax.config.update instead — it takes effect at first backend use.
import jax

# CPU backend with 8 virtual devices so multi-chip sharding paths
# compile and execute without TPU hardware (the driver benches on the
# real chip separately).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

jax.config.update("jax_enable_x64", True)

from pangulu_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
