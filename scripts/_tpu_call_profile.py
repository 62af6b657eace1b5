import sys, time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from profile_call import ensure_obs

obs = ensure_obs(int(sys.argv[1]) if len(sys.argv) > 1 else 11000)
import numpy as np
from varlociraptor_tpu.calling.call import CallOptions, call_generic
from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario
from varlociraptor_tpu.ops.posterior import PosteriorEngine
from varlociraptor_tpu.calling import fastcall

calls = []
orig = PosteriorEngine.run_compact


def timed(self, obs_f16, *a, **k):
    t0 = time.perf_counter()
    r = orig(self, obs_f16, *a, **k)
    calls.append((obs_f16.shape, round(time.perf_counter() - t0, 2)))
    return r


PosteriorEngine.run_compact = timed

t_phase = {"window": 0.0, "fmt": 0.0, "n_windows": 0}
orig_cw = fastcall.ColumnarCaller.call_window_cb
orig_fmt = fastcall.ColumnarCaller.format_window


def timed_cw(self, *a, **k):
    t0 = time.perf_counter()
    r = orig_cw(self, *a, **k)
    t_phase["window"] += time.perf_counter() - t0
    t_phase["n_windows"] += 1
    return r


def timed_fmt(self, *a, **k):
    t0 = time.perf_counter()
    r = orig_fmt(self, *a, **k)
    t_phase["fmt"] += time.perf_counter() - t0
    return r


fastcall.ColumnarCaller.call_window_cb = timed_cw
fastcall.ColumnarCaller.format_window = timed_fmt

for i in range(2):
    calls.clear()
    t_phase.update(window=0.0, fmt=0.0, n_windows=0)
    t0 = time.perf_counter()
    n = call_generic(
        tumor_normal_scenario(0.75), obs, Path("/tmp/x.vcf"), CallOptions()
    )
    dt = time.perf_counter() - t0
    eng = sum(c[-1] for c in calls)
    print(
        f"run {i}: {n} loci {dt:.1f}s | engine {eng:.1f}s/{len(calls)} calls "
        f"| window-total {t_phase['window']:.1f}s ({t_phase['n_windows']} windows) "
        f"| fmt {t_phase['fmt']:.1f}s | other {dt - t_phase['window'] - t_phase['fmt']:.1f}s"
    )
    from collections import Counter

    print("   ", Counter(calls).most_common(8))
