#!/usr/bin/env python
"""Profile the call stage host loop on cached observation files.

Usage: python scripts/profile_call.py [N] [--cpu] [--prof] [--batch B]
Creates/reuses /tmp/vlt_prof_obs_<N>/{tumor,normal}.obs.jsonl.
"""

import cProfile
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

RES = Path("/root/reference/tests/resources")


def ensure_obs(n_candidates: int):
    tmp = Path(f"/tmp/vlt_prof_obs_{n_candidates}")
    obs = {s: tmp / f"{s}.obs.jsonl" for s in ("tumor", "normal")}
    if all(p.exists() for p in obs.values()):
        return obs
    tmp.mkdir(exist_ok=True)
    from bench_preprocess import make_candidates
    from varlociraptor_tpu.calling.preprocess import PreprocessOptions, preprocess
    from varlociraptor_tpu.estimation.alignment_properties import estimate
    from varlociraptor_tpu.io.bam import BamReader
    from varlociraptor_tpu.io.fasta import FastaBuffer

    cand = tmp / "candidates.vcf"
    make_candidates(n_candidates, cand)
    props = estimate(
        BamReader(RES / "tumor-first30000.bam"),
        reference=FastaBuffer(RES / "chr10.fa"),
    )
    for sample, out in obs.items():
        preprocess(
            cand,
            RES / "tumor-first30000.bam",
            RES / "chr10.fa",
            out,
            sample_name=sample,
            alignment_properties=props,
            options=PreprocessOptions(n_workers=4, log_mode="silent"),
        )
    return obs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2500
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    obs = ensure_obs(n)

    from varlociraptor_tpu.calling.call import CallOptions, call_generic
    from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario

    batch = None
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    opts = CallOptions(**({"batch_size": batch} if batch else {}))
    out = Path(f"/tmp/vlt_prof_calls_{n}.vcf")

    def go():
        t0 = time.perf_counter()
        nrec = call_generic(tumor_normal_scenario(0.75), obs, out, opts)
        dt = time.perf_counter() - t0
        print(f"call: {nrec} records in {dt:.2f}s = {nrec/dt:.0f} loci/s")

    if "--prof" in sys.argv:
        prof = cProfile.Profile()
        prof.enable()
        go()
        prof.disable()
        st = pstats.Stats(prof)
        st.sort_stats("cumulative").print_stats(45)
    else:
        go()


if __name__ == "__main__":
    main()
