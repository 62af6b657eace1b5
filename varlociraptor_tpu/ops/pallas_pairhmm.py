"""Pallas TPU kernel for the exact semiglobal pair-HMM forward.

The production model (reference defaults, ``GapParams`` pairhmm.rs:134-141)
has ZERO gap-extension probabilities, so the D and I states have no
self-recurrence:

    D(i,j) = t_md * M(i-1, j)
    I(i,j) = m_j * t_mi * M(i, j-1)          (+ the free-start term at j=1)

Substituting both into the M recurrence collapses the three-state DP into a
single-state, three-term COLUMN recurrence

    M(i,j) = e_m(i,j) * [ t_mm        * M(i-1, j-1)
                        + t_dm*t_md   * M(i-2, j-1)
                        + t_im*t_mi*m_{j-1} * M(i-1, j-2) ]

which is exactly the TPU-native shape: the allele axis i lives on the 128
lanes (shift-and-multiply-add), the read axis j is a short sequential
fori_loop, the whole DP state (two previous columns) stays in VMEM, and a
tile of 8 work items rides the sublanes. Compare ops/pairhmm.py's
``_forward_impl``: an anti-diagonal ``lax.scan`` of X+Y steps with log-space
logsumexp chains — this kernel does Y steps of ~10 linear-space VPU ops.

Scope (documented, enforced by the dispatcher in ops/pairhmm.py):
- exact mode with -inf extension probabilities only (the reference default;
  nanopore profiles with finite extensions keep the general kernels),
- full-window forward (the banded edit-distance pruning of the general
  kernels is a lane-sequential min-recurrence that does not pay here; the
  band only removes probability mass the full forward already dominates).

Linear-space f32 with per-column, per-item rescaling (the C++ twin
``vlt_pairhmm_one`` uses the same scheme in f64).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TB = 8  # work items per grid step (sublane tile)
RESCALE_THRESH = 1e-16
RESCALE = 1e16


def _kernel(allele_ref, read_ref, mis_ref, alen_ref, rlen_ref, coef_ref,
            out_ref, mjm1, mjm2, scale, acc, mprev):
    """One tile of TB items: allele [TB, Xp] f32 (0 = pad), read [TB, Yp] f32
    (base codes exact in f32), mis [TB, Yp] f32 (LINEAR miscall prob),
    alen/rlen [TB, 1] i32, coef [1, 4] f32 in SMEM =
    (t_mm, t_dm*t_md, t_im*t_mi, t_mi). out [TB, 1] f32 log-prob.
    Scratch: mjm1/mjm2 [TB, Xp] f32 columns, scale/acc/mprev [TB, 1] f32."""
    Xp = allele_ref.shape[1]
    Yp = read_ref.shape[1]
    t_mm = coef_ref[0, 0]
    c_del = coef_ref[0, 1]
    c_ins = coef_ref[0, 2]
    t_mi = coef_ref[0, 3]

    allele = allele_ref[:]
    alen = alen_ref[:]  # [TB, 1]
    rlen = rlen_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, Xp), 1)
    valid = lane < alen  # lane k holds allele position i = k+1
    lane_y = jax.lax.broadcasted_iota(jnp.int32, (TB, Yp), 1)

    mjm1[:] = jnp.zeros((TB, Xp), jnp.float32)
    mjm2[:] = jnp.zeros((TB, Xp), jnp.float32)
    scale[:] = jnp.zeros((TB, 1), jnp.float32)  # accumulated -log scale
    acc[:] = jnp.zeros((TB, 1), jnp.float32)
    mprev[:] = jnp.zeros((TB, 1), jnp.float32)

    m1 = mis_ref[:, 0:1]  # miscall of the first read base [TB, 1]

    def _shift(x, k):
        # static shift right by k lanes, zero-fill (Pallas TPU: no dynamic
        # lane slicing, so all lane movement is static concatenation)
        return jnp.concatenate(
            [jnp.zeros((TB, k), jnp.float32), x[:, : Xp - k]], axis=1
        )

    def col(j, _):
        # j is 1-based read position. Column j's read base / miscall are
        # extracted with a masked lane reduction (dynamic_slice along lanes
        # does not lower on TPU Pallas); miscall of base j-1 is carried in
        # the mprev scratch register across iterations.
        sel = lane_y == (j - 1)
        rj = jnp.sum(jnp.where(sel, read_ref[:], 0.0), axis=1, keepdims=True)
        mj = jnp.sum(jnp.where(sel, mis_ref[:], 0.0), axis=1, keepdims=True)
        mjm = mprev[:]  # miscall of read base j-1 (I path); unused when j<2
        match = allele == rj
        is_n = rj == float(ord("N"))
        e_m = jnp.where(
            match,
            1.0 - mj,
            jnp.where(is_n, 0.25, mj * (1.0 / 3.0)),
        )
        e_m = jnp.where(valid, e_m, 0.0)

        prev1 = mjm1[:]
        prev2 = mjm2[:]
        sh1 = _shift(prev1, 1)
        sh2 = _shift(prev1, 2)
        ins1 = _shift(prev2, 1)

        start_w = jnp.where(j == 1, jnp.exp(-scale[:]), 0.0)  # [TB,1]
        # free-start I at column 1 feeds M at column 2 for every i
        start_i = jnp.where(j == 2, c_ins * m1 * jnp.exp(-scale[:]), 0.0)
        bracket = t_mm * sh1 + c_del * sh2 + c_ins * mjm * ins1
        mj_col = e_m * (bracket + start_w + start_i)

        # per-item rescale to keep f32 alive over long reads
        colmax = jnp.max(mj_col, axis=1, keepdims=True)
        need = (colmax > 0.0) & (colmax < RESCALE_THRESH)
        f = jnp.where(need, RESCALE, 1.0)
        mj_col = mj_col * f
        prev1s = prev1 * f
        scale[:] = scale[:] + jnp.where(need, math.log(RESCALE), 0.0)

        # free end gap in x: at j == rlen, total = sum_i M(i,Y) + I(i,Y)
        at_end = rlen == j  # [TB, 1]
        m_sum = jnp.sum(mj_col, axis=1, keepdims=True)
        i_sum = jnp.where(
            j == 1,
            mj * t_mi * (alen.astype(jnp.float32) + 1.0) * jnp.exp(-scale[:]),
            mj * t_mi * jnp.sum(prev1s, axis=1, keepdims=True),
        )
        fin = m_sum + i_sum
        acc[:] = jnp.where(at_end, fin, acc[:])
        # freeze the log scale of finished items alongside their acc
        out_ref[:] = jnp.where(
            at_end,
            jnp.where(fin > 0.0, jnp.log(jnp.maximum(fin, 1e-300)), -1e30)
            - scale[:],
            out_ref[:],
        )

        mjm2[:] = prev1s
        mjm1[:] = mj_col
        mprev[:] = mj
        return 0

    out_ref[:] = jnp.full((TB, 1), -1e30, jnp.float32)
    jax.lax.fori_loop(1, Yp + 1, col, 0)


@partial(jax.jit, static_argnames=("x_pad", "y_pad", "interpret"))
def _pallas_forward(allele, read, mis, alen, rlen, coef, x_pad, y_pad,
                    interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = allele.shape[0]
    n_tiles = B // TB
    grid = (n_tiles,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, x_pad), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, y_pad), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, y_pad), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TB, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TB, x_pad), jnp.float32),
            pltpu.VMEM((TB, x_pad), jnp.float32),
            pltpu.VMEM((TB, 1), jnp.float32),
            pltpu.VMEM((TB, 1), jnp.float32),
            pltpu.VMEM((TB, 1), jnp.float32),
        ],
        interpret=interpret,
    )(allele, read, mis, alen, rlen, coef)
    return out[:, 0]


def pallas_exact_forward(alleles, reads, quals, gap, interpret=False):
    """Batched forward log-probs via the Pallas column kernel.

    alleles: list[bytes]; reads: list[uint8 arrays]; quals: list[uint8];
    gap: [4] LOG gap params (t_mi, t_md, t_ii, t_dd) with t_ii/t_dd = -inf
    (caller-enforced). Returns np.float64 [n]."""
    n = len(alleles)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    B = ((n + TB - 1) // TB) * TB
    Xp = max(128, -(-max(len(a) for a in alleles) // 128) * 128)
    Yp = max(128, -(-max(len(r) for r in reads) // 128) * 128)
    allele = np.zeros((B, Xp), dtype=np.float32)
    read = np.zeros((B, Yp), dtype=np.float32)
    mis = np.zeros((B, Yp), dtype=np.float32)
    alen = np.zeros((B, 1), dtype=np.int32)
    rlen = np.ones((B, 1), dtype=np.int32)
    for b in range(n):
        a = np.frombuffer(bytes(alleles[b]), dtype=np.uint8)
        r = np.asarray(reads[b], dtype=np.uint8)
        q = np.asarray(quals[b], dtype=np.float64)
        allele[b, : len(a)] = a & ~np.uint8(0x20)
        read[b, : len(r)] = r & ~np.uint8(0x20)
        mis[b, : len(q)] = np.exp(-q * math.log(10.0) / 10.0)
        alen[b, 0] = len(a)
        rlen[b, 0] = max(len(r), 1)
    g_mi = math.exp(gap[0])
    g_md = math.exp(gap[1])
    t_mm = max(1.0 - g_mi - g_md, 1e-12)
    coef = np.array(
        [[t_mm, (1.0 - 0.0) * g_md, (1.0 - 0.0) * g_mi, g_mi]],
        dtype=np.float32,
    )
    # with zero extensions, the close probabilities t_dm/t_im are exactly 1
    out = _pallas_forward(
        jnp.asarray(allele),
        jnp.asarray(read),
        jnp.asarray(mis),
        jnp.asarray(alen),
        jnp.asarray(rlen),
        jnp.asarray(coef),
        Xp,
        Yp,
        interpret=interpret,
    )
    return np.asarray(out, dtype=np.float64)[:n]
