#!/usr/bin/env python
"""Benchmark: loci/sec/chip for posterior evaluation (tumor-normal).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md), so vs_baseline is
measured against a fixed nominal 1000 loci/s — roughly the serial per-core
rate of the reference's posterior stage on commodity CPUs (observed order of
magnitude; the reference's own CHANGELOG only records qualitative speedups).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

NOMINAL_BASELINE_LOCI_PER_SEC = 1000.0


def main():
    import jax

    from varlociraptor_tpu.bench_utils import engine_inputs, tumor_normal_engine

    n_loci = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    depth = 64

    _, engine = tumor_normal_engine()
    inputs = engine_inputs(engine, n_loci=n_loci, depth=depth)
    args = [jax.numpy.asarray(a) for a in inputs]

    # compile + warmup
    out = engine._run(*args)
    jax.block_until_ready(out["posteriors"])

    n_iter = 5
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = engine._run(*args)
    jax.block_until_ready(out["posteriors"])
    dt = time.perf_counter() - t0

    loci_per_sec = n_loci * n_iter / dt
    print(
        json.dumps(
            {
                "metric": "loci_per_sec_per_chip_posterior_tumor_normal",
                "value": round(float(loci_per_sec), 1),
                "unit": "loci/s",
                "vs_baseline": round(loci_per_sec / NOMINAL_BASELINE_LOCI_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
