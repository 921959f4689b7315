"""Kernel backend dispatch.

Counterpart of the reference's platform layer
(``pangulu_kernel_interface.c`` + the generated dispatch in
``src/platforms/pangulu_platform_common.h`` / ``build_helper.py``):
kernels are resolved through a small registry so the numeric engine is
backend-agnostic.  Registered backends:

  * ``"jax"``    — pure-JAX reference kernels (run anywhere; the
    analogue of the reference's CPU_NAIVE platform 0x0100000).
  * ``"pallas"`` — hand-written Pallas TPU kernels for the hot ops
    (analogue of the CUDA platform 0x0201000).
  * ``"auto"``   — pallas on TPU where the shape qualifies, else jax.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax


@dataclasses.dataclass(frozen=True)
class KernelBackend:
    name: str
    getrf: Callable          # (tile, tol) -> tile (L\U packed)
    getrf_batched: Callable  # (tiles, tol) -> tiles
    tstrf: Callable          # (diag, b) -> X @ U = B solve
    gessm: Callable          # (diag, b) -> L @ X = B solve
    ssssm: Callable          # (c, a, b) -> c - a@b
    diag_inverses: Callable  # factored diag -> (L^-1, U^-1)
    diag_factor_invert: Callable  # raw diag -> (f, L^-1, U^-1), MXU-only
    trsv_lower_unit: Callable
    trsv_upper: Callable
    spmv_sub: Callable
    vecadd: Callable
    # tiny-pivot substitution threshold baked into the engines' traces
    # (None = per-dtype DEFAULT_TOL); set via InitOptions.tol
    tol: float | None = None


_REGISTRY: dict[str, KernelBackend] = {}


def register_backend(backend: KernelBackend) -> None:
    _REGISTRY[backend.name] = backend


def _jax_backend() -> KernelBackend:
    from pangulu_tpu.ops import kernels_jax as k

    return KernelBackend(
        name="jax",
        getrf=k.getrf,
        getrf_batched=lambda tiles, tol=None: jax.vmap(
            lambda t: k.getrf(t, tol))(tiles),
        tstrf=k.tstrf,
        gessm=k.gessm,
        ssssm=k.ssssm,
        diag_inverses=k.diag_inverses,
        diag_factor_invert=k.getrf_with_inverses,
        trsv_lower_unit=k.trsv_lower_unit,
        trsv_upper=k.trsv_upper,
        spmv_sub=k.spmv_sub,
        vecadd=k.vecadd,
    )


def get_backend(name: str = "auto", nb: int = 256,
                dtype=None, tol: float | None = None) -> KernelBackend:
    if not _REGISTRY:
        register_backend(_jax_backend())
        try:
            from pangulu_tpu.ops import kernels_pallas

            register_backend(kernels_pallas.make_backend())
        except Exception:  # pallas unavailable on this platform
            pass
    if name == "auto":
        on_tpu = jax.default_backend() == "tpu"
        use_pallas = (
            on_tpu
            and "pallas" in _REGISTRY
            and nb % 128 == 0
            and (dtype is None
                 or jax.numpy.dtype(dtype) == jax.numpy.float32)
        )
        backend = _REGISTRY["pallas" if use_pallas else "jax"]
        return (dataclasses.replace(backend, tol=tol)
                if tol is not None else backend)
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown kernel backend {name!r}; have {sorted(_REGISTRY)}")
    backend = _REGISTRY[name]
    return (dataclasses.replace(backend, tol=tol)
            if tol is not None else backend)
