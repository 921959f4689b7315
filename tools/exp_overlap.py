"""Microbenchmark: does Mosaic overlap independent VPU work (masked
rank-1 scan steps) with MXU dots inside one fori_loop body?

Decides the super-level mega-kernel design: if t(combined) ~=
max(t(scan), t(dots)) the scan hides under the Schur stream and an
interleaved task loop wins; if t(combined) ~= t(scan)+t(dots) there is
no VPU/MXU overlap and the win must come from flop reduction instead.

Run ON CHIP: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_overlap.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangulu_tpu.utils import device_sync, enable_compilation_cache

NB = 128
STEPS = 128 * 32  # total iterations per kernel call


def _scan_step(f, k, tol=1e-8):
    dt = f.dtype
    rows = lax.broadcasted_iota(jnp.int32, (NB, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, NB), 1)
    rows_f = lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
    cols_f = lax.broadcasted_iota(jnp.int32, (NB, NB), 1)
    kk = lax.rem(k, jnp.int32(NB))
    rowv = jnp.sum(jnp.where(rows_f == kk, f, jnp.zeros((), dt)),
                   axis=0, keepdims=True)
    colv = jnp.sum(jnp.where(cols_f == kk, f, jnp.zeros((), dt)),
                   axis=1, keepdims=True)
    piv = jnp.sum(jnp.where(cols[0:1, :] == kk, rowv, jnp.zeros((), dt)),
                  axis=1, keepdims=True)
    safe = jnp.where(jnp.abs(piv) < tol, jnp.asarray(tol, dt), piv)
    lcol = jnp.where(rows > kk, colv / safe, jnp.zeros((), dt))
    urow = jnp.where(cols > kk, rowv, jnp.zeros((), dt))
    return f - lcol * urow


def _kernel(mode, a_ref, b_ref, out_ref, fbuf, acc):
    fbuf[:, :] = a_ref[:, :]
    acc[:, :] = b_ref[:, :]

    def body(k, c):
        if mode in ("scan", "both"):
            fbuf[:, :] = _scan_step(fbuf[:, :], k)
        if mode in ("dots", "both"):
            acc[:, :] = jnp.dot(a_ref[:, :], acc[:, :],
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
        return c

    lax.fori_loop(0, STEPS, body, 0)
    out_ref[:, :] = fbuf[:, :] + acc[:, :]


@functools.partial(jax.jit, static_argnames=("mode",))
def run(a, b, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode),
        out_shape=jax.ShapeDtypeStruct((NB, NB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NB, NB), jnp.float32)] * 2,
        interpret=jax.default_backend() != "tpu",
    )(a, b)


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (NB, NB), jnp.float32) * 0.01 + jnp.eye(NB)
    b = jax.random.normal(key, (NB, NB), jnp.float32) * 0.01
    for mode in ("scan", "dots", "both"):
        r = device_sync(run(a, b, mode))  # compile + warm
        t0 = time.perf_counter()
        K = 20
        for _ in range(K):
            r = run(a, b, mode)
        device_sync(r)
        dt = (time.perf_counter() - t0) / K
        print(f"{mode:5s}: {dt*1e3:8.3f} ms/call "
              f"({dt/STEPS*1e9:7.1f} ns/step)")


if __name__ == "__main__":
    main()
