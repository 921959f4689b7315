#!/usr/bin/env python
"""Benchmark driver: numeric-factorization GFLOPS on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: numeric-phase GFLOPS (dense-tile flop model / wall time) on a
3D Poisson model problem — the same headline metric the reference
prints under -DPANGULU_PERF (pangulu_strings.h:84).  The reference
repo publishes no numbers (BASELINE.md); the baseline constant below
is this repo's own measured single-core CPU-backend throughput for the
identical problem, so vs_baseline tracks TPU speedup over the CPU
execution of the same algorithm.
"""

import json
import os
import sys
import time

# Measured on this environment's 1-core CPU backend (jax 0.9, f32,
# poisson3d(20), nb=128) — see BASELINE.md "measured" table.
BASELINE_GFLOPS = 2.0


def main():
    from pangulu_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from pangulu_tpu.api import InitOptions, gstrf, init
    from pangulu_tpu.models import poisson3d

    nx = int(os.environ.get("PANGULU_BENCH_NX", "20"))
    nb = int(os.environ.get("PANGULU_BENCH_NB", "128"))
    a = poisson3d(nx)

    opts = InitOptions(nb=nb, dtype="r32", ordering="rcm",
                       symbolic_mode="block")
    handle = init(a, opts)

    # Warm-up run compiles every level signature; timed run measures
    # steady-state throughput (factor-once is the product operation, but
    # compile time amortizes across solves in production and is cached
    # on disk across runs).
    gstrf(handle)
    handle.perf.phase_time.pop("numeric", None)
    handle.perf.flops = 0.0
    gstrf(handle)

    gflops = handle.perf.gflops("numeric")
    result = {
        "metric": "numeric_factorization_gflops",
        "value": round(gflops, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(gflops / BASELINE_GFLOPS, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
