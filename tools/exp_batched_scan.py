"""Probe: batched diag-chain cost vs batch size G on the real chip.

Decides the super-level GROUP kernel design: if the masked-reduction
LU scan is latency-bound, a 3D (G, nb, nb) batched scan amortizes the
per-step cost ~G-fold; if it is VPU-throughput-bound, batching only
amortizes fixed per-level overhead and the Newton latency.  Also
probes whether Mosaic lowers lax.dot_general with a leading batch
dimension (batched Newton inverses).

Run ON CHIP:
PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_batched_scan.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangulu_tpu.utils import device_sync, enable_compilation_cache

NB = 128
TOL = 1e-8
REPS = 50


def _scan_step_3d(f, k, *, g, nb, tol):
    dt = f.dtype
    rows_f = lax.broadcasted_iota(jnp.int32, (g, nb, nb), 1)
    cols_f = lax.broadcasted_iota(jnp.int32, (g, nb, nb), 2)
    rowv = jnp.sum(jnp.where(rows_f == k, f, jnp.zeros((), dt)),
                   axis=1, keepdims=True)           # (g, 1, nb)
    colv = jnp.sum(jnp.where(cols_f == k, f, jnp.zeros((), dt)),
                   axis=2, keepdims=True)           # (g, nb, 1)
    piv = jnp.sum(jnp.where(
        lax.broadcasted_iota(jnp.int32, (g, 1, nb), 2) == k, rowv,
        jnp.zeros((), dt)), axis=2, keepdims=True)  # (g, 1, 1)
    safe = jnp.where(jnp.abs(piv) < tol, jnp.asarray(tol, dt), piv)
    below = lax.broadcasted_iota(jnp.int32, (g, nb, 1), 1) > k
    right = lax.broadcasted_iota(jnp.int32, (g, 1, nb), 2) > k
    lcol = jnp.where(below, colv / safe, jnp.zeros((), dt))
    urow = jnp.where(right, rowv, jnp.zeros((), dt))
    return f - lcol * urow


def _batched_scan_kernel(a_ref, o_ref, *, g, nb, tol):
    f = lax.fori_loop(
        0, nb, lambda k, f: _scan_step_3d(f, k, g=g, nb=nb, tol=tol),
        a_ref[:, :, :])
    o_ref[:, :, :] = f


def batched_scan(a, *, g, nb, tol):
    return pl.pallas_call(
        functools.partial(_batched_scan_kernel, g=g, nb=nb, tol=tol),
        out_shape=jax.ShapeDtypeStruct((g, nb, nb), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)


def _batched_newton_kernel(l_ref, o_ref, *, g, nb, steps):
    dt = o_ref.dtype
    eye = jnp.where(
        lax.broadcasted_iota(jnp.int32, (g, nb, nb), 1)
        == lax.broadcasted_iota(jnp.int32, (g, nb, nb), 2),
        jnp.ones((), dt), jnp.zeros((), dt))
    lm = l_ref[:, :, :]
    x = 2 * eye - lm

    def dot(a, b):
        return lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt,
            precision=lax.Precision.HIGHEST)

    def body(_, x):
        return dot(x, 2 * eye - dot(lm, x))

    o_ref[:, :, :] = lax.fori_loop(0, steps, body, x)


def batched_newton(lm, *, g, nb, steps):
    return pl.pallas_call(
        functools.partial(_batched_newton_kernel, g=g, nb=nb,
                          steps=steps),
        out_shape=jax.ShapeDtypeStruct((g, nb, nb), lm.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(lm)


def _newton_loop_kernel(l_ref, o_ref, *, g, nb, steps):
    """Per-member fori-loop Newton (3D refs indexed .at[m]) — the
    fallback if batched dot_general does not lower."""
    dt = o_ref.dtype
    eye = jnp.where(
        lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        == lax.broadcasted_iota(jnp.int32, (nb, nb), 1),
        jnp.ones((), dt), jnp.zeros((), dt))

    def member(m, c):
        lm = l_ref[m]
        x = 2 * eye - lm

        def body(_, x):
            return jnp.dot(x, 2 * eye - jnp.dot(
                lm, x, preferred_element_type=dt,
                precision=lax.Precision.HIGHEST),
                preferred_element_type=dt,
                precision=lax.Precision.HIGHEST)

        o_ref[m] = lax.fori_loop(0, steps, body, x)
        return c

    lax.fori_loop(0, g, member, 0)


def newton_loop(lm, *, g, nb, steps):
    return pl.pallas_call(
        functools.partial(_newton_loop_kernel, g=g, nb=nb, steps=steps),
        out_shape=jax.ShapeDtypeStruct((g, nb, nb), lm.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(lm)


def time_fn(fn, x):
    y = device_sync(fn(x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        y = fn(y)
    device_sync(y)
    return (time.perf_counter() - t0) / REPS


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print("--- batched 3D LU scan ---")
    base = None
    for g in (1, 2, 4, 8, 16, 32):
        a = jnp.asarray(
            rng.standard_normal((g, NB, NB)).astype(np.float32)
            + 4 * np.eye(NB, dtype=np.float32))
        try:
            dt = time_fn(lambda x: batched_scan(x, g=g, nb=NB, tol=TOL), a)
        except Exception as e:  # noqa: BLE001
            print(f"G={g:3d}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        if base is None:
            base = dt
        print(f"G={g:3d}: {dt*1e6:8.1f} us  ({dt/base:5.2f}x G=1, "
              f"{dt/g*1e6:6.1f} us/tile)")

    print("--- batched Newton (dot_general batch dim) ---")
    steps = max((NB - 1).bit_length() - 1, 0)
    base = None
    for g in (1, 2, 4, 8, 16):
        lm = np.tril(rng.standard_normal((g, NB, NB)).astype(np.float32),
                     -1) + np.eye(NB, dtype=np.float32)
        lm = jnp.asarray(lm)
        try:
            dt = time_fn(
                lambda x: batched_newton(x, g=g, nb=NB, steps=steps), lm)
        except Exception as e:  # noqa: BLE001
            print(f"G={g:3d}: FAILED {type(e).__name__}: {str(e)[:120]}")
            break
        if base is None:
            base = dt
        print(f"G={g:3d}: {dt*1e6:8.1f} us  ({dt/base:5.2f}x G=1, "
              f"{dt/g*1e6:6.1f} us/tile)")

    print("--- per-member fori Newton (fallback) ---")
    base = None
    for g in (1, 4, 8, 16):
        lm = np.tril(rng.standard_normal((g, NB, NB)).astype(np.float32),
                     -1) + np.eye(NB, dtype=np.float32)
        lm = jnp.asarray(lm)
        try:
            dt = time_fn(
                lambda x: newton_loop(x, g=g, nb=NB, steps=steps), lm)
        except Exception as e:  # noqa: BLE001
            print(f"G={g:3d}: FAILED {type(e).__name__}: {str(e)[:120]}")
            break
        if base is None:
            base = dt
        print(f"G={g:3d}: {dt*1e6:8.1f} us  ({dt/base:5.2f}x G=1, "
              f"{dt/g*1e6:6.1f} us/tile)")


if __name__ == "__main__":
    main()
