#!/usr/bin/env python
"""Pair-HMM kernel microbenchmark: JAX anti-diagonal wavefront vs the Pallas
column kernel (and the native C++ host kernel for reference) on one synthetic
realignment batch (zero-extension exact model, the reference default).

Runs on the DEFAULT jax platform (axon TPU on the bench box).

    python scripts/bench_pairhmm_kernels.py [B] [X] [Y]
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    from varlociraptor_tpu.utils.jaxcache import enable as _exc

    _exc()
    import jax.numpy as jnp

    from varlociraptor_tpu.ops.pairhmm import NEG_INF, _forward_impl
    from varlociraptor_tpu.ops.pallas_pairhmm import pallas_exact_forward

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    X = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    Y = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    alleles = [bytes(rng.choice(bases, X)) for _ in range(B)]
    reads = []
    for b in range(B):
        p = rng.integers(0, X - Y)
        r = np.frombuffer(alleles[b], dtype=np.uint8)[p : p + Y].copy()
        idx = rng.integers(0, Y, size=3)
        r[idx] = rng.choice(bases, 3)
        reads.append(r)
    quals = [np.full(Y, 30, dtype=np.uint8) for _ in range(B)]
    gap = np.array(
        [math.log(2.8e-6), math.log(5.1e-6), NEG_INF, NEG_INF], dtype=np.float32
    )

    def timed(fn, n=5):
        out = fn()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        return (time.perf_counter() - t0) / n, np.asarray(out)

    # wavefront kernel, padded batch, full window
    al = np.zeros((B, X), np.uint8)
    alen = np.full(B, X, np.int32)
    rd = np.zeros((B, Y), np.uint8)
    rlen = np.full(B, Y, np.int32)
    mis = np.full((B, Y), -30 * math.log(10) / 10, np.float32)
    for b in range(B):
        al[b] = np.frombuffer(alleles[b], np.uint8)
        rd[b] = reads[b]
    me = np.full(B, -1, np.int32)
    args = [jnp.asarray(a) for a in (al, alen, rd, mis, rlen, gap, me)]

    t_wave, out_wave = timed(
        lambda: np.asarray(_forward_impl(*args, X, Y))
    )
    # pack once (host-side, vectorized) and time the device call alone —
    # the wavefront is timed on pre-packed args too, so this is fair
    from varlociraptor_tpu.ops.pallas_pairhmm import (
        _pallas_forward,
        pack_exact_batch,
    )

    t_pk0 = time.perf_counter()
    pargs, _n, Xp, Yp = pack_exact_batch(alleles, reads, quals, gap)
    t_pack = time.perf_counter() - t_pk0
    jargs = [jnp.asarray(a) for a in pargs]
    t_pl, out_pl = timed(
        lambda: np.asarray(_pallas_forward(*jargs, Xp, Yp))[:B]
    )
    rel = np.abs(out_wave[:B] - out_pl) / np.maximum(np.abs(out_pl), 1.0)

    from varlociraptor_tpu.io.native import pairhmm_forward_batch

    miscalls = [mis[b] for b in range(B)]
    t_nat0 = time.perf_counter()
    out_nat = pairhmm_forward_batch(alleles, reads, miscalls, gap)
    t_nat = time.perf_counter() - t_nat0

    cells = B * X * Y
    print(
        f"B={B} X={X} Y={Y}  cells={cells/1e6:.1f}M\n"
        f"wavefront (jax):  {t_wave*1e3:8.2f} ms  {cells/t_wave/1e9:7.2f} Gcells/s\n"
        f"pallas column:    {t_pl*1e3:8.2f} ms  {cells/t_pl/1e9:7.2f} Gcells/s  "
        f"(speedup {t_wave/t_pl:.1f}x; max rel dev {float(rel.max()):.2e}; "
        f"host pack {t_pack*1e3:.1f} ms)\n"
        f"native C++ host:  {t_nat*1e3:8.2f} ms  {cells/t_nat/1e9:7.2f} Gcells/s"
    )


if __name__ == "__main__":
    main()
