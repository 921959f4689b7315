"""Mosaic feasibility probe: can a compiled TPU Pallas kernel
decompress a u16-indexed value list into a dense tile in VMEM?

Tries three in-kernel strategies on a compiled (NOT interpret) kernel:
  A. one-hot matmul decompress: dense = onehot(idx) @ vals (MXU,
     always lowers, cost nn*cap MACs per tile);
  B. jnp scatter (dense.at[idx].set) on a VMEM value;
  C. jnp gather (vals[idx2]) compress direction.

Whichever compiles and validates decides the compressed-in-mega design
(VERDICT r2 #3).  Run ON CHIP:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_scatter.py
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
NN = NB * NB
CAP = 1024   # slots per tile (128-aligned)


def _kernel(mode, vals_ref, idx_ref, out_ref):
    nn = NN
    if mode == "onehot":
        # rows = slots, cols = flat positions; dense_flat = vals @ onehot
        pos = idx_ref[:, :].astype(jnp.int32)       # [8, CAP/8] ? keep 2D
        # build [CAP, NN] onehot in chunks of 128 lanes is too big;
        # instead scatter into a [CAP, NB] row-block per slot row id
        # — simplest: accumulate over slots via fori (slow but compiles)
        def body(s, acc):
            p = idx_ref[0, s]
            v = vals_ref[0, s]
            r = p // NB
            c = p % NB
            onerow = jnp.where(
                (lax.broadcasted_iota(jnp.int32, (NB, NB), 0) == r)
                & (lax.broadcasted_iota(jnp.int32, (NB, NB), 1) == c),
                v, jnp.zeros((), vals_ref.dtype))
            return acc + onerow

        out_ref[:, :] = lax.fori_loop(
            0, CAP, body, jnp.zeros((NB, NB), vals_ref.dtype))
    elif mode == "scatter":
        idx = idx_ref[0, :].astype(jnp.int32)
        vals = vals_ref[0, :]
        dense = jnp.zeros((NN,), vals_ref.dtype).at[idx].set(vals)
        out_ref[:, :] = dense.reshape(NB, NB)
    elif mode == "scatter2d":
        idx = idx_ref[:, :].astype(jnp.int32)       # [8, CAP//8]
        vals = vals_ref[:, :]
        dense = jnp.zeros((NN,), vals_ref.dtype).at[
            idx.reshape(-1)].set(vals.reshape(-1))
        out_ref[:, :] = dense.reshape(NB, NB)
    elif mode == "gather":
        idx = idx_ref[0, :].astype(jnp.int32)
        flat = out_ref[:, :].reshape(NN)  # read, then gather back
        g = flat[idx]
        out_ref[0:1, 0:CAP // NB * NB] = g[: CAP // NB * NB].reshape(
            1, -1)


@functools.partial(jax.jit, static_argnames=("mode",))
def run(vals, idx, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode),
        out_shape=jax.ShapeDtypeStruct((NB, NB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=False,   # the whole point: compiled Mosaic
    )(vals, idx)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    perm = rng.permutation(NN)[:CAP].astype(np.int32)
    perm.sort()
    vals = rng.standard_normal(CAP).astype(np.float32)
    want = np.zeros(NN, np.float32)
    want[perm] = vals
    want = want.reshape(NB, NB)
    v2 = vals.reshape(8, CAP // 8)
    i2 = perm.reshape(8, CAP // 8)
    v1 = np.zeros((1, CAP), np.float32)
    v1[0] = vals
    i1 = np.zeros((1, CAP), np.int32)
    i1[0] = perm
    for mode, vv, ii in (("scatter", v1, i1), ("scatter2d", v2, i2),
                         ("onehot", v1, i1)):
        try:
            t0 = time.perf_counter()
            out = device_sync(run(jnp.asarray(vv), jnp.asarray(ii),
                                  mode))
            dt = time.perf_counter() - t0
            ok = np.allclose(np.asarray(out), want)
            t0 = time.perf_counter()
            for _ in range(50):
                out = run(jnp.asarray(vv), jnp.asarray(ii), mode)
            device_sync(out)
            per = (time.perf_counter() - t0) / 50
            print(f"{mode:10s}: compiled OK={ok} "
                  f"compile+run {dt:.1f}s, {per*1e6:.0f} us/tile")
        except Exception as e:
            print(f"{mode:10s}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
