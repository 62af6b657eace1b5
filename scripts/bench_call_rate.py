#!/usr/bin/env python
"""Measure the call-stage rate on cached observation files.

Usage: python scripts/bench_call_rate.py [N] [--cpu] [--runs R] [--batch B]
Reuses/creates /tmp/vlt_prof_obs_<N>; prints loci/s per run.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2500
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    runs = (
        int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3
    )
    from profile_call import ensure_obs

    obs = ensure_obs(n)
    from varlociraptor_tpu.calling.call import CallOptions, call_generic
    from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario

    kw = {}
    if "--batch" in sys.argv:
        kw["batch_size"] = int(sys.argv[sys.argv.index("--batch") + 1])
    for i in range(runs):
        t0 = time.perf_counter()
        cnt = call_generic(
            tumor_normal_scenario(0.75), obs, Path("/tmp/bench_calls.vcf"),
            CallOptions(**kw),
        )
        dt = time.perf_counter() - t0
        print(f"run {i}: {cnt} loci in {dt:.2f}s = {cnt/dt:.0f} loci/s")


if __name__ == "__main__":
    main()
