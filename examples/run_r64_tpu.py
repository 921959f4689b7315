"""r64 on TPU at speed: the double-float engine (ops/dd.py).

The TPU has no f64 datapath; dtype="r64" auto-dispatches the dd engine
(hi/lo f32 pairs + exact-sliced MXU matmuls, ~1e-13-class residuals).

    python examples/run_r64_tpu.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pangulu_tpu.api import InitOptions, finalize, gssv, init
from pangulu_tpu.models import poisson3d
from pangulu_tpu.utils.perf import residual_norm


def main():
    a = poisson3d(12)
    b = np.asarray(a.to_scipy() @ np.ones(a.n))
    h = init(a, InitOptions(nb=128, dtype="r64"))
    x = gssv(h, b)
    print(h.perf.summary())
    print("dispatch:", getattr(h._factorizer, "dispatch", "?"))
    print("residual:", residual_norm(a.to_scipy(), x, b))
    finalize(h)


if __name__ == "__main__":
    main()
