"""pangulu_tpu — a TPU-native distributed sparse direct LU solver.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
PanguLU reference (reference: /root/reference, SC'23 sparse direct solver):

  * ``Ax = b`` for general sparse A via ``A = LU`` factorization
  * MC64-style max-weight matching + equilibration scaling
  * fill-reducing ordering (AMD / RCM / natural)
  * scalar symbolic factorization with elimination-tree pruning
  * 2D block-cyclic numeric factorization over a TPU device mesh
  * blocked sparse triangular solves (SpTRSV)
  * value types R32 / R64 / CR32 / CR64

Public API mirrors the reference's five entry points
(``pangulu.h:11-15``): :func:`init`, :func:`gstrf`, :func:`gstrs`,
:func:`gssv`, :func:`finalize` — plus a Pythonic :class:`Solver` wrapper.

The execution model is TPU-native, not a translation: equally-sized
blocks are stored as dense MXU tiles, the reference's synchronisation-
free task DAG (pangulu_task.c / pangulu_numeric.c) is re-expressed as a
level-scheduled sequence of batched block kernels, and MPI point-to-
point block exchange (pangulu_communication.c) becomes per-level mesh
collectives.
"""

from pangulu_tpu.api import (
    InitOptions,
    analyze,
    factor_diagnostics,
    Solver,
    finalize,
    gssv,
    gstrf,
    gstrs,
    gstrs_device,
    init,
    spsolve,
    update_values,
)
from pangulu_tpu.version import __version__

__all__ = [
    "InitOptions",
    "analyze",
    "factor_diagnostics",
    "Solver",
    "init",
    "gstrf",
    "gstrs",
    "gstrs_device",
    "gssv",
    "spsolve",
    "update_values",
    "finalize",
    "__version__",
]
