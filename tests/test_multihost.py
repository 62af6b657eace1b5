"""True multi-process sharding test: 2 processes x 4 CPU devices = one
8-device global mesh over jax.distributed (the multi-host/DCN story,
SURVEY.md §2.9), verified against a single-process run of the same batch.
"""

import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_call_matches_single_process():
    port = _free_port()
    outdir = tempfile.mkdtemp(prefix="vlt-multihost-")
    worker = Path(__file__).parent / "multihost_worker.py"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), outdir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    # single-process reference over the identical full batch
    from varlociraptor_tpu.bench_utils import engine_inputs, tumor_normal_engine

    _, engine = tumor_normal_engine()
    L, HALF = 48, 24
    full = engine_inputs(engine, n_loci=L, depth=16, seed=11)
    ref = engine.run(*full)

    d0 = np.load(Path(outdir) / "proc0.npz")
    d1 = np.load(Path(outdir) / "proc1.npz")
    post = np.concatenate([d0["posteriors"], d1["posteriors"]])
    af = np.concatenate([d0["af"], d1["af"]])
    marg = np.concatenate([d0["marginal"], d1["marginal"]])
    dph = np.concatenate([d0["dphred"], d1["dphred"]])

    fin = np.isfinite(ref["posteriors"])
    assert np.array_equal(np.isfinite(post), fin)
    assert np.allclose(post[fin], ref["posteriors"][fin], atol=2e-3), np.max(
        np.abs(post[fin] - ref["posteriors"][fin])
    )
    assert np.allclose(af, ref["af"], atol=1e-5)
    finm = np.isfinite(ref["marginal"])
    assert np.allclose(marg[finm], ref["marginal"][finm], atol=2e-3)
    # AFD: same shipped slots, deci-PHRED within 1 unit (sum-order jitter)
    same = dph != 32767
    assert np.array_equal(same, ref["densities_dphred"] != 32767)
    assert np.max(np.abs(dph[same] - ref["densities_dphred"][same])) <= 1

    # collective gather replicated identically on both processes
    assert np.array_equal(d0["gathered"], d1["gathered"])
