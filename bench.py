#!/usr/bin/env python
"""Benchmark: loci/sec/chip for posterior evaluation (tumor-normal).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: every timed iteration forces a device->host transfer of
ALL engine outputs (np.asarray). `jax.block_until_ready` does NOT synchronize
on the experimental `axon` platform (round-1 VERDICT measured a ~4000x
dispatch-vs-execution gap), so only host-materialized outputs count. A
scaling sanity check asserts wall-time grows with n_loci before the number
is trusted.  The headline is the dispatch-ahead steady state (window i+1
computes while window i's single packed wire buffer crosses the tunnel) —
the same PendingWindow pattern the production caller uses; `extra.roofline`
carries the serial number, the compute-only split, the wire bytes/locus and
XLA cost-analysis flops.

The reference publishes no benchmark numbers (BASELINE.md) and cannot be
built in this image (no Rust toolchain), so vs_baseline is MEASURED against
the same engine + same locus batch on this host's XLA CPU backend
(scripts/bench_posterior_cpu.py, all cores); the measured figure is reported
alongside. The `extra` key carries the end-to-end pipeline number
(BAM -> preprocess x2 -> tumor-normal call -> FDR; scripts/bench_e2e.py) and
a TPU-backend preprocess measurement (device_chunk batched pair-HMM).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

NOMINAL_BASELINE_LOCI_PER_SEC = 1000.0  # fallback if the CPU run fails


def _measured_cpu_baseline(n_loci=8192):
    """Same engine + inputs on the XLA CPU backend, in a subprocess (this
    process holds the TPU client).  Returns (loci/s, flops_per_program,
    hbm_bytes_per_program) — the latter two from XLA cost analysis of the
    identical HLO (roofline provenance)."""
    try:
        out = subprocess.run(
            [sys.executable, "/root/repo/scripts/bench_posterior_cpu.py", str(n_loci)],
            capture_output=True,
            text=True,
            timeout=420,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        lines = out.stdout.strip().splitlines()
        flops = next(
            (float(ln.split()[1]) for ln in lines if ln.startswith("FLOPS ")),
            None,
        )
        nbytes = next(
            (
                float(ln.split()[1])
                for ln in lines
                if ln.startswith("HBM_BYTES ")
            ),
            None,
        )
        return float(lines[-1]), flops, nbytes
    except Exception:  # noqa: BLE001
        return None, None, None


def _bench_e2e():
    try:
        sys.path.insert(0, "/root/repo/scripts")
        from bench_e2e import run as e2e_run

        return e2e_run(n_candidates=3000, workers=4)
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"[:160]}


def _bench_e2e_large():
    """>=100K-candidate planted-somatics witness (scripts/bench_e2e_large).
    Runs INLINE (the call stage must share this process's TPU client).
    When the simulated world isn't already cached under /tmp, runs at a
    reduced candidate count so the one-time ~4 min simulation doesn't
    dominate the bench budget."""
    try:
        sys.path.insert(0, "/root/repo/scripts")
        import bench_e2e_large as bel

        cached = (bel.CACHE / "world.json").exists()
        n = 100_000 if cached else 20_000
        out = bel.run(n_candidates=n, workers=4)
        out["world_cached"] = cached
        return out
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"[:160]}


def _bench_call_rate():
    """Production call-stage rate on cached real observation files, with
    the per-stage breakdown (VERDICT r4 item 1).  Uses the largest cached
    /tmp/vlt_prof_obs_* workload (generates a 20K one if none)."""
    try:
        import time as _t
        from pathlib import Path as _P

        sys.path.insert(0, "/root/repo/scripts")
        from profile_call import ensure_obs

        n = next(
            (
                k
                for k in (100000, 50000, 20000, 10000)
                if _P(f"/tmp/vlt_prof_obs_{k}/tumor.obs.jsonl").exists()
            ),
            20000,
        )
        obs = ensure_obs(n)
        from varlociraptor_tpu.calling import fastcall, observations
        from varlociraptor_tpu.calling import columnar as colmod
        from varlociraptor_tpu.calling.call import CallOptions, call_generic
        from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario

        stages = {}

        def hook(owner, name, key):
            fn = getattr(owner, name)
            stages[key] = [0.0, 0]

            def timed(*a, **k):
                t0 = _t.perf_counter()
                r = fn(*a, **k)
                stages[key][0] += _t.perf_counter() - t0
                stages[key][1] += 1
                return r

            setattr(owner, name, timed)
            return fn

        orig = [
            (observations.ObservationReader, "read_window",
             hook(observations.ObservationReader, "read_window", "read_obs")),
            (colmod.ColumnarBatch, "from_sample_windows",
             hook(colmod.ColumnarBatch, "from_sample_windows", "build_cb")),
            (fastcall.ColumnarCaller, "call_window_cb",
             hook(fastcall.ColumnarCaller, "call_window_cb", "pack_dispatch")),
            (fastcall.PendingWindow, "finish",
             hook(fastcall.PendingWindow, "finish", "wait_fetch_unpack")),
            (fastcall.ColumnarCaller, "format_window_text",
             hook(fastcall.ColumnarCaller, "format_window_text", "format")),
        ]
        try:
            rates = []
            for i in range(3):
                for v in stages.values():
                    v[0], v[1] = 0.0, 0
                t0 = _t.perf_counter()
                cnt = call_generic(
                    tumor_normal_scenario(0.75), obs,
                    _P("/tmp/bench_calls.vcf"),
                    CallOptions(batch_size=4096),
                )
                rates.append(cnt / (_t.perf_counter() - t0))
        finally:
            for owner, name, fn in orig:
                setattr(owner, name, fn)
        return {
            "n_loci": cnt,
            "loci_per_sec_warm": round(max(rates), 1),
            "runs": [round(r, 1) for r in rates],
            "stage_seconds_last_run": {
                k: round(v[0], 2) for k, v in stages.items()
            },
            "note": (
                "stages overlap (dispatch thread + drain thread); "
                "pack_dispatch includes the async device dispatch"
            ),
        }
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"[:160]}


def _bench_preprocess_tpu(n=256):
    """Preprocess with the pair-HMM forwards batched across loci onto the
    device (device_chunk): measures the TPU-backend preprocess path."""
    try:
        import tempfile
        from pathlib import Path

        sys.path.insert(0, "/root/repo/scripts")
        from bench_preprocess import RES, make_candidates
        from varlociraptor_tpu.calling.preprocess import (
            PreprocessOptions,
            preprocess,
        )

        os.environ["VLT_NATIVE_PAIRHMM"] = "0"  # JAX kernel on the device
        tmp = Path(tempfile.mkdtemp(prefix="vlt-pre-tpu-"))
        cand = tmp / "c.vcf"
        n_written = make_candidates(n, cand)

        def _run(out_name, props=None):
            t0 = time.perf_counter()
            count = preprocess(
                cand,
                RES / "tumor-first30000.bam",
                RES / "chr10.fa",
                tmp / out_name,
                sample_name="t",
                alignment_properties=props,
                options=PreprocessOptions(device_chunk=64, log_mode="silent"),
            )
            return round((time.perf_counter() - t0) / max(count, 1) * 1000, 2), count

        ms, count = _run("obs.jsonl")
        out = {
            "ms_per_locus": ms,
            "n_loci": count,
            "device_chunk": 64,
            "budget": (
                "wire-bound through the axon tunnel: device kernel 6.9 "
                "us/forward but inputs ~32KB/locus at ~24MB/s = 1.3 "
                "ms/locus transfer alone vs 0.45 ms/locus host-C++ total; "
                "crossover ~70-100 MB/s — see docs/preprocess_tpu_budget.md"
            ),
        }
        try:
            # Pallas column kernel path: needs zero-extension gap params
            # (the reference CLI defaults), which BAM-estimated properties
            # replace with finite MLE extensions — measure with defaults
            from varlociraptor_tpu.estimation.alignment_properties import (
                estimate,
            )
            from varlociraptor_tpu.io.bam import BamReader
            from varlociraptor_tpu.io.fasta import FastaBuffer

            props = estimate(
                BamReader(RES / "tumor-first30000.bam"),
                reference=FastaBuffer(RES / "chr10.fa"),
            )
            from varlociraptor_tpu.estimation.alignment_properties import (
                GapParams,
            )
            import math as _math

            props.gap_params = GapParams(
                prob_insertion_artifact=_math.log(2.8e-6),
                prob_deletion_artifact=_math.log(5.1e-6),
                prob_insertion_extend_artifact=float("-inf"),
                prob_deletion_extend_artifact=float("-inf"),
            )
            os.environ["VLT_PALLAS_PAIRHMM"] = "1"
            ms_pl, _c = _run("obs-pallas.jsonl", props=props)
            out["ms_per_locus_pallas"] = ms_pl
        except Exception as e:  # noqa: BLE001
            out["pallas_error"] = f"{type(e).__name__}: {e}"[:120]
        finally:
            os.environ.pop("VLT_PALLAS_PAIRHMM", None)
        return out
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"[:160]}
    finally:
        os.environ.pop("VLT_NATIVE_PAIRHMM", None)


def _timed(engine, inputs, n_iter, pipelined=True):
    import jax.numpy as jnp

    args = [jnp.asarray(a) for a in inputs]
    # engine.run is the production path: it materializes EVERY output on
    # the host (posteriors, MAP AFs, deci-PHRED AFDs, MAP artifact slots),
    # packed into ONE wire buffer fetch; np.asarray inside run() is the
    # only trustworthy sync on axon (block_until_ready is a no-op there).
    out = engine.run(*args)
    assert all(isinstance(v, np.ndarray) for v in out.values())
    if not pipelined:
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = engine.run(*args)
        return time.perf_counter() - t0
    # dispatch-ahead steady state: window i+1 computes on the device while
    # window i's wire buffer crosses the tunnel and unpacks — exactly how
    # the production caller consumes the engine (fastcall.PendingWindow);
    # every iteration still fully host-materializes every output.
    t0 = time.perf_counter()
    prev = engine.run(*args, fetch=False)
    for _ in range(n_iter - 1):
        nxt = engine.run(*args, fetch=False)
        out = engine.fetch_run(prev)
        prev = nxt
    out = engine.fetch_run(prev)
    assert all(isinstance(v, np.ndarray) for v in out.values())
    return time.perf_counter() - t0


def _timed_compute_only(engine, inputs, n_iter):
    """Device-compute time alone: the same program reduced to one scalar so
    the tunnel transfer is ~0 bytes (roofline split of compute vs wire)."""
    import jax
    import jax.numpy as jnp

    args = [jnp.asarray(a) for a in inputs]
    L = args[0].shape[0]
    n_art = jnp.full(
        (L,), float(engine.n_artifact_combos or 1), dtype=jnp.float32
    )
    try:
        fn = jax.jit(
            lambda *a: jnp.sum(
                engine._pack_out(engine._run_impl(*a), a[1])
            )
        )
        np.asarray(fn(*args, None, n_art))
    except Exception:  # noqa: BLE001
        return None
    t0 = time.perf_counter()
    for _ in range(n_iter):
        np.asarray(fn(*args, None, n_art))
    return time.perf_counter() - t0


def _tunnel_alive(timeout_s: int = 150) -> bool:
    """Tiny device op in a subprocess: the axon tunnel is single-client and
    can be DOWN (observed mid-round-3: a trivial matmul blocks forever at
    0% CPU). Probing in a child keeps this process's jax uninitialized."""
    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((64, 64));"
        "print(float(np.asarray((x @ x).sum())))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if os.environ.get("VLT_BENCH_CHILD") != "1":
        # supervisor: probe the tunnel, run the measurement in a timed child
        # so a wedged device can never leave the driver without a JSON line.
        # Round-5 observation: the tunnel FLAPS on a ~30-60 min cycle, so a
        # single failed probe would condemn a whole round's numbers to the
        # CPU fallback — retry across a ~14-min window before giving up
        # (VLT_BENCH_PROBE_RETRIES overrides; 1 = the old single probe).
        retries = int(os.environ.get("VLT_BENCH_PROBE_RETRIES", "5"))
        alive = False
        for attempt in range(max(retries, 1)):
            alive = _tunnel_alive()
            if alive:
                break
            if attempt + 1 < max(retries, 1):
                print(
                    f"# tunnel probe {attempt + 1} failed; retrying in 180s",
                    file=sys.stderr,
                )
                time.sleep(180)
        env = {**os.environ, "VLT_BENCH_CHILD": "1"}
        note = None
        if not alive:
            env["JAX_PLATFORMS"] = "cpu"
            env["VLT_BENCH_FORCE_CPU"] = "1"
            note = (
                "axon TPU tunnel unresponsive (tiny-op probe timed out); "
                "measured on the XLA CPU backend instead"
            )
        def _run_child(child_env, timeout):
            try:
                out = subprocess.run(
                    [sys.executable, __file__] + sys.argv[1:],
                    capture_output=True,
                    timeout=timeout,
                    text=True,
                    env=child_env,
                )
                return next(
                    (
                        ln
                        for ln in reversed(out.stdout.strip().splitlines())
                        if ln.startswith("{")
                    ),
                    None,
                )
            except subprocess.TimeoutExpired:
                return None

        line = _run_child(env, 2400)
        if line is None and "VLT_BENCH_FORCE_CPU" not in env:
            # the tunnel answered the probe but died mid-run: degrade to CPU
            env["JAX_PLATFORMS"] = "cpu"
            env["VLT_BENCH_FORCE_CPU"] = "1"
            note = (
                "axon TPU tunnel died mid-benchmark; re-measured on the XLA "
                "CPU backend"
            )
            line = _run_child(env, 2400)
        if line is None:
            print(
                json.dumps(
                    {
                        "metric": "loci_per_sec_per_chip_posterior_tumor_normal",
                        "value": 0.0,
                        "unit": "loci/s",
                        "vs_baseline": 0.0,
                        "error": "bench child produced no result (device hang?)",
                        "tunnel_alive": alive,
                    }
                )
            )
            return
        if note:
            d = json.loads(line)
            d["platform"] = "cpu-fallback"
            d["error"] = note
            line = json.dumps(d)
        print(line)
        return

    if os.environ.get("VLT_BENCH_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from varlociraptor_tpu.utils.jaxcache import enable as enable_xla_cache

    enable_xla_cache()  # first compile through the axon tunnel costs minutes
    from varlociraptor_tpu.bench_utils import engine_inputs, tumor_normal_engine

    force_cpu = os.environ.get("VLT_BENCH_FORCE_CPU") == "1"
    # the CPU fallback measures the same engine at a size the host finishes
    # in minutes (the 32K-locus TPU batch takes ~30 s/iter on 4 CPU cores)
    n_loci = int(sys.argv[1]) if len(sys.argv) > 1 else (8192 if force_cpu else 32768)
    depth = 64

    _, engine = tumor_normal_engine()

    # scaling sanity check: if wall-time does not grow with the locus count,
    # we are measuring dispatch, not execution — refuse to report.
    small = max(n_loci // 4, 64)
    small_inputs = engine_inputs(engine, n_loci=small, depth=depth)
    # min over rounds: a single tunnel-latency spike on the small batch
    # made the scaling guard fire spuriously (round-5 trial)
    t_small = min(_timed(engine, small_inputs, 2) for _ in range(3))
    # the remote-tunnel round trips add noisy contention (observed up to
    # ~3x between identical runs); take the best of three measurement
    # rounds — the minimum wall-time is the least-contended, most
    # hardware-representative sample, and every round still forces full
    # host materialization of all outputs
    inputs = engine_inputs(engine, n_loci=n_loci, depth=depth)
    n_iter, rounds = (3, 1) if force_cpu else (5, 3)
    dt = min(_timed(engine, inputs, n_iter) for _ in range(rounds))
    dt_serial = min(
        _timed(engine, inputs, n_iter, pipelined=False) for _ in range(rounds)
    ) if not force_cpu else dt
    dt_compute = None
    if not force_cpu:
        dtc = _timed_compute_only(engine, inputs, n_iter)
        dt_compute = dtc / n_iter if dtc else None
    per_iter_small = t_small / 2
    per_iter_big = dt / n_iter
    if per_iter_big < 1.5 * per_iter_small and n_loci >= 4 * small:
        # re-measure both sides once before refusing: a noisy tunnel can
        # fake a non-scaling result in either direction
        t_small = min(
            t_small, min(_timed(engine, small_inputs, 2) for _ in range(2))
        )
        dt = min(dt, min(_timed(engine, inputs, n_iter) for _ in range(2)))
        per_iter_small = t_small / 2
        per_iter_big = dt / n_iter
    if per_iter_big < 1.5 * per_iter_small and n_loci >= 4 * small:
        print(
            json.dumps(
                {
                    "metric": "loci_per_sec_per_chip_posterior_tumor_normal",
                    "value": 0.0,
                    "unit": "loci/s",
                    "vs_baseline": 0.0,
                    "error": "timing does not scale with n_loci (dispatch-only measurement)",
                }
            )
        )
        return

    loci_per_sec = n_loci * n_iter / dt

    if force_cpu:
        # the fallback headline IS the baseline methodology (same engine,
        # same backend) — re-measuring it separately only injects run-to-run
        # noise into the ratio, so the ratio is 1.0 by construction
        cpu_rate, flops, hbm_bytes = loci_per_sec, None, None
        provenance = (
            "identical by construction: the CPU fallback runs the baseline "
            "engine on the baseline backend"
        )
    else:
        cpu_rate, flops, hbm_bytes = _measured_cpu_baseline()
        provenance = (
            "same engine + same batch on this host's XLA CPU backend "
            "(scripts/bench_posterior_cpu.py)"
            if cpu_rate
            else "nominal (CPU baseline run failed)"
        )
    baseline = cpu_rate if cpu_rate else NOMINAL_BASELINE_LOCI_PER_SEC
    # roofline: split the per-window wall time into device compute vs the
    # packed-wire tunnel fetch, and report HLO flops (XLA cost analysis of
    # the identical program at the CPU-baseline batch, scaled per locus)
    roofline = {
        "wire_bytes_per_locus": round(engine.wire_bytes(n_loci) / n_loci, 1),
        "methodology": (
            "headline = dispatch-ahead steady state (window i+1 computes "
            "while window i's wire buffer transfers + unpacks; the "
            "production caller's PendingWindow pattern); every window "
            "fully host-materializes every output"
        ),
    }
    if not force_cpu:
        per_it_pipelined = dt / n_iter
        per_it_serial = dt_serial / n_iter
        roofline["serial_loci_per_sec"] = round(n_loci / per_it_serial, 1)
        if dt_compute:
            roofline["device_compute_loci_per_sec"] = round(
                n_loci / dt_compute, 1
            )
            wire_s = max(per_it_serial - dt_compute, 1e-9)
            roofline["tunnel_mb_per_s"] = round(
                engine.wire_bytes(n_loci) / wire_s / 1e6, 1
            )
        if flops:
            # flops is for the CPU-baseline batch (8192 loci by default)
            flops_per_locus = flops / 8192.0
            roofline["flops_per_locus"] = round(flops_per_locus, 1)
            roofline["achieved_gflops"] = round(
                flops_per_locus * loci_per_sec / 1e9, 2
            )
            if dt_compute:
                roofline["device_gflops"] = round(
                    flops_per_locus * n_loci / dt_compute / 1e9, 2
                )
        if hbm_bytes:
            roofline["hbm_bytes_per_locus"] = round(hbm_bytes / 8192.0, 1)
            roofline["hbm_bytes_provenance"] = (
                "XLA cost-analysis of the CPU-backend HLO (operand-use "
                "accounting, NOT device HBM traffic — see "
                "docs/engine_roofline.md; the TPU program fuses the big "
                "intermediates)"
            )
    extra = {
        "e2e": _bench_e2e(),
        # call_rate first: it traces/warms the batch-4096 window programs
        # that e2e_large's call stage then reuses
        "call_rate": _bench_call_rate(),
        "e2e_large": _bench_e2e_large(),
        "preprocess_tpu": _bench_preprocess_tpu(),
        "roofline": roofline,
        "baseline_cpu_loci_per_sec": round(cpu_rate, 1) if cpu_rate else None,
        "baseline_provenance": provenance,
    }
    print(
        json.dumps(
            {
                "metric": "loci_per_sec_per_chip_posterior_tumor_normal",
                "value": round(float(loci_per_sec), 1),
                "unit": "loci/s",
                "vs_baseline": round(loci_per_sec / baseline, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
