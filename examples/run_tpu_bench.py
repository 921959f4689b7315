#!/usr/bin/env python
"""Single-chip TPU performance demo: factor a 3D Poisson problem with
the Pallas mega-kernel engine and solve with the single-launch SpTRSV.

    python examples/run_tpu_bench.py [nx]

Timing note (this class of tunneled environments): any host readback
costs a full round trip, so throughput is measured over K chained runs
with one final sync — see bench.py for the canonical harness.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np


def main():
    from pangulu_tpu.utils import device_sync, enable_compilation_cache

    enable_compilation_cache()
    from pangulu_tpu import InitOptions, gstrf, gstrs, init
    from pangulu_tpu.models import poisson3d
    from pangulu_tpu.utils.perf import residual_norm

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    a = poisson3d(nx)
    print(f"poisson3d({nx}): n={a.n}, nnz={a.nnz}")

    h = init(a, InitOptions(nb=128, dtype="r32", ordering="rcm",
                            symbolic_mode="block"))
    t0 = time.perf_counter()
    gstrf(h)
    print(f"gstrf: {time.perf_counter() - t0:.2f} s "
          f"({h.perf.gflops('numeric'):.0f} GFLOPS incl. sync)")

    b = np.asarray(a.to_scipy() @ np.ones(a.n, dtype=np.float32))
    x = gstrs(h, b)
    res = residual_norm(a.to_scipy(), x, b)
    print(h.perf.summary())
    print(f"solve residual ||Ax-b||/||b|| = {res:.3e}")


if __name__ == "__main__":
    main()
