#!/usr/bin/env python
"""Sweep all reference golden testcases; report pass/fail/skip table.

Usage: JAX_PLATFORMS=cpu python scripts/run_testcases.py [pattern] [--timeout N]
"""

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TESTCASES = Path("/root/reference/tests/resources/testcases")


SHOULD_PANIC = {"test_overlapping_events"}  # tests/lib.rs:160

# Testcases the reference's own CI comments out as unresolvable
# (tests/lib.rs:36-38,54-57,117-119,129-131,135-136). A failure here is
# reported as XFAIL (not counted against the pass rate); a pass counts.
REFERENCE_SKIPS = {
    "test21",  # "this insertion cannot currently be resolved properly"
    "test38",  # "most likely a strand bias artifact, correctly recognized"
    "test_giab_14",  # "bad luck: reads look like a homopolymer artifact"
    "test_giab_24",  # "unlucky combination of homology artifacts"
    "test_giab_28",  # "unlucky combination of homology artifacts"
}


PAIRHMM_OVERRIDE = None  # set by main() for --mode fast sweeps


def run_one(name, q, mode=None):
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from varlociraptor_tpu.utils.jaxcache import enable as _exc
    _exc()
    from varlociraptor_tpu.testcase import Testcase

    t0 = time.time()
    try:
        tc = Testcase(TESTCASES / name)
        if name in SHOULD_PANIC:
            try:
                tc.check(pairhmm_mode=mode)
                q.put((name, "FAIL", "expected scenario validation error", time.time() - t0))
            except Exception:
                q.put((name, "PASS", "(expected failure)", time.time() - t0))
            return
        tc.check(pairhmm_mode=mode)
        q.put((name, "PASS", "", time.time() - t0))
    except AssertionError as e:
        if name in REFERENCE_SKIPS:
            q.put((name, "XFAIL", f"(reference CI skips this) {str(e)[:150]}", time.time() - t0))
        else:
            q.put((name, "FAIL", str(e)[:200], time.time() - t0))
    except NotImplementedError as e:
        q.put((name, "SKIP", str(e)[:120], time.time() - t0))
    except Exception as e:  # noqa: BLE001
        q.put((name, "ERROR", f"{type(e).__name__}: {str(e)[:160]}", time.time() - t0))


def main():
    pattern = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else ""
    timeout = 240
    if "--timeout" in sys.argv:
        timeout = int(sys.argv[sys.argv.index("--timeout") + 1])
    mode = None
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    only = None
    if "--fast-list" in sys.argv:
        # the subset the reference asserts in fast mode (tests/lib.rs)
        only = set("""test01 test02 test03 test04 test05 test06 test07 test08 test09
            test10 test11 test12 test13 test14 test15 test16 test17 test18 test19
            test20 test21 test22 test23 test24 test25 test26 test27 test28 test29
            test30 test31 test32 test33 test34 test36 test37 test38 test39 test40
            test41 test42 test43 test45 test47 test48 test52 test53 test54 test55
            pattern_too_long test_long_pattern test_contig_universe issue_154
            test_l2fc test_cmp""".split())
    names = sorted(
        d.name
        for d in TESTCASES.iterdir()
        if d.is_dir()
        and (d / "testcase.yaml").exists()
        and pattern in d.name
        and (only is None or d.name in only)
    )
    workers = 3  # leave one core for the parent (override with --jobs N)
    if "--jobs" in sys.argv:
        workers = int(sys.argv[sys.argv.index("--jobs") + 1])

    results = {}
    pending = list(names)
    running = {}  # name -> (process, queue, deadline)
    while pending or running:
        while pending and len(running) < workers:
            name = pending.pop(0)
            q = mp.Queue()
            p = mp.Process(target=run_one, args=(name, q, mode))
            p.start()
            running[name] = (p, q, time.time() + timeout)
        time.sleep(0.2)
        for name in list(running):
            p, q, deadline = running[name]
            if p.is_alive() and time.time() < deadline:
                continue
            if p.is_alive():
                p.terminate()
                p.join()
                results[name] = ("TIMEOUT", "", timeout)
            else:
                p.join()
                try:
                    n, status, msg, dt = q.get_nowait()
                    results[name] = (status, msg, dt)
                except Exception:  # noqa: BLE001
                    results[name] = ("CRASH", "", 0)
            del running[name]
            status, msg, dt = results[name]
            print(f"{name:40s} {status:8s} {dt:6.1f}s  {msg}", flush=True)

    counts = {}
    for status, _, _ in results.values():
        counts[status] = counts.get(status, 0) + 1
    print("\n==== SUMMARY ====")
    for k, v in sorted(counts.items()):
        print(f"{k}: {v}")
    out = {
        n: {"status": s, "msg": m, "secs": round(dt, 1)}
        for n, (s, m, dt) in results.items()
    }
    Path("/tmp/testcase_results.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
