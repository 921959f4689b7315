"""Microbenchmark 2: Q independent rank-1 scan chains interleaved in
one fori body — does per-chain latency amortize (VPU pipelining)?

Also: Q scans + 1 dot stream (the realistic super-level mix).

Run ON CHIP: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_scan_multi.py
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
STEPS = 128 * 16


def _scan_step(f, kk, tol=1e-8):
    dt = f.dtype
    rows = lax.broadcasted_iota(jnp.int32, (NB, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, NB), 1)
    rows_f = lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
    cols_f = lax.broadcasted_iota(jnp.int32, (NB, NB), 1)
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


def _kernel(q, with_dot, a_ref, b_ref, out_ref, acc):
    acc[:, :] = b_ref[:, :]

    def body(k, fs):
        kk = lax.rem(k, jnp.int32(NB))
        fs = tuple(_scan_step(f, kk) for f in fs)
        if with_dot:
            acc[:, :] = jnp.dot(a_ref[:, :], acc[:, :],
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
        return fs

    fs = tuple(a_ref[:, :] + jnp.float32(i) for i in range(q))
    fs = lax.fori_loop(0, STEPS, body, fs)
    r = fs[0]
    for f in fs[1:]:
        r = r + f
    out_ref[:, :] = r + acc[:, :]


@functools.partial(jax.jit, static_argnames=("q", "with_dot"))
def run(a, b, q, with_dot):
    return pl.pallas_call(
        functools.partial(_kernel, q, with_dot),
        out_shape=jax.ShapeDtypeStruct((NB, NB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NB, NB), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(a, b)


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (NB, NB), jnp.float32) * 0.01 + jnp.eye(NB)
    b = jax.random.normal(key, (NB, NB), jnp.float32) * 0.01
    for q in (1, 2, 4, 8):
        for wd in (False, True):
            r = device_sync(run(a, b, q, wd))
            t0 = time.perf_counter()
            K = 10
            for _ in range(K):
                r = run(a, b, q, wd)
            device_sync(r)
            dt = (time.perf_counter() - t0) / K
            print(f"q={q} dot={int(wd)}: {dt*1e3:8.3f} ms/call "
                  f"({dt/STEPS*1e9:7.1f} ns/step, "
                  f"{dt/STEPS/q*1e9:7.1f} ns/step/chain)")


if __name__ == "__main__":
    main()
