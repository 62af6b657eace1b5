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

which is exactly the TPU-native shape. Layout (the TPU-critical choice):
WORK ITEMS ride the 128 LANES and ALLELE POSITIONS ride the sublanes, so

- the per-column read base / miscall lookup is a dynamic SUBLANE slice of
  the transposed read/miscall panels (``ref[pl.ds(j-1, 1), :]`` — a plain
  VMEM row-address offset; dynamic slicing along the LANE axis does not
  lower on Mosaic and masked lane-reductions cost ~7 shuffle steps each),
- the i-1 / i-2 state shifts are static sublane concatenations,
- the finish/rescale reductions run across sublanes, once per column,
- every vector op in the column body touches [Xp, 128] = Xp/8 full vregs,
  so the ~10-op body amortizes its loop overhead across 128 items at once.

Compare ops/pairhmm.py's ``_forward_impl``: an anti-diagonal ``lax.scan``
of X+Y steps with log-space logsumexp chains — this kernel does Y steps of
~10 linear-space VPU ops. (A first version with items on sublanes and
alleles on lanes ran 10x SLOWER than the XLA wavefront: per-column
cross-lane reductions + 2-vreg ops; this transposed layout is the fix.)

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

TB = 128  # work items per grid step (lane tile)
RESCALE_THRESH = 1e-16
RESCALE = 1e16


def _kernel(allele_ref, read_ref, mis_ref, alen_ref, rlen_ref, coef_ref,
            out_ref, mjm1, mjm2, scale, mprev):
    """One tile of TB items, item axis on LANES: allele [Xp, TB] f32
    (0 = pad; base codes are exact in f32), read [Yp, TB] f32,
    mis [Yp, TB] f32 (LINEAR miscall prob), alen/rlen [1, TB] i32,
    coef [1, 4] f32 in SMEM = (t_mm, t_dm*t_md, t_im*t_mi, t_mi).
    out [1, TB] f32 log-prob. Scratch: mjm1/mjm2 [Xp, TB] f32 columns,
    scale/mprev [1, TB] f32."""
    from jax.experimental import pallas as pl

    Xp = allele_ref.shape[0]
    Yp = read_ref.shape[0]
    t_mm = coef_ref[0, 0]
    c_del = coef_ref[0, 1]
    c_ins = coef_ref[0, 2]
    t_mi = coef_ref[0, 3]

    allele = allele_ref[:]
    alen = alen_ref[:]  # [1, TB]
    rlen = rlen_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (Xp, TB), 0)
    valid = row < alen  # sublane k holds allele position i = k+1

    mjm1[:] = jnp.zeros((Xp, TB), jnp.float32)
    mjm2[:] = jnp.zeros((Xp, TB), jnp.float32)
    scale[:] = jnp.zeros((1, TB), jnp.float32)  # accumulated -log scale
    mprev[:] = jnp.zeros((1, TB), jnp.float32)

    m1 = mis_ref[0:1, :]  # miscall of the first read base [1, TB]

    def _shift(x, k):
        # static shift down by k sublanes (allele position i-k), zero-fill
        return jnp.concatenate(
            [jnp.zeros((k, TB), jnp.float32), x[: Xp - k, :]], axis=0
        )

    def col(j, _):
        # j is 1-based read position; row j-1 of the transposed panels
        rj = read_ref[pl.dslice(j - 1, 1), :]  # [1, TB]
        mj = mis_ref[pl.dslice(j - 1, 1), :]
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

        start_w = jnp.where(j == 1, jnp.exp(-scale[:]), 0.0)  # [1, TB]
        # free-start I at column 1 feeds M at column 2 for every i
        start_i = jnp.where(j == 2, c_ins * m1 * jnp.exp(-scale[:]), 0.0)
        bracket = t_mm * sh1 + c_del * sh2 + c_ins * mjm * ins1
        mj_col = e_m * (bracket + start_w + start_i)

        # per-item rescale to keep f32 alive over long reads
        colmax = jnp.max(mj_col, axis=0, keepdims=True)
        need = (colmax > 0.0) & (colmax < RESCALE_THRESH)
        f = jnp.where(need, RESCALE, 1.0)
        mj_col = mj_col * f
        prev1s = prev1 * f
        scale[:] = scale[:] + jnp.where(need, math.log(RESCALE), 0.0)

        # free end gap in x: at j == rlen, total = sum_i M(i,Y) + I(i,Y)
        at_end = rlen == j  # [1, TB]
        m_sum = jnp.sum(mj_col, axis=0, keepdims=True)
        i_sum = jnp.where(
            j == 1,
            mj * t_mi * (alen.astype(jnp.float32) + 1.0) * jnp.exp(-scale[:]),
            mj * t_mi * jnp.sum(prev1s, axis=0, keepdims=True),
        )
        fin = m_sum + i_sum
        # freeze the log(fin)-scale of finished items at their end column
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

    out_ref[:] = jnp.full((1, TB), -1e30, jnp.float32)
    jax.lax.fori_loop(1, Yp + 1, col, 0)


@partial(jax.jit, static_argnames=("x_pad", "y_pad", "interpret"))
def _pallas_forward(allele_u8, read_u8, qual_u8, alen, rlen, coef, x_pad,
                    y_pad, interpret=False):
    """allele_u8/read_u8: [B, Xp/Yp] uint8 row-major (host packs contiguous
    rows and ships 1/4 the bytes); qual_u8: [B, Yp] uint8 PHRED. The
    transpose to the kernel's item-on-lanes layout, the f32 cast, the
    uppercase fold and the PHRED->linear-miscall exp all run on device."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    allele = (allele_u8 & np.uint8(0xDF)).T.astype(jnp.float32)
    read = (read_u8 & np.uint8(0xDF)).T.astype(jnp.float32)
    mis = jnp.exp(
        qual_u8.T.astype(jnp.float32) * jnp.float32(-math.log(10.0) / 10.0)
    )
    # pad columns (beyond rlen) carry qual 0 -> miscall 1.0, but the kernel
    # masks them via rlen/valid, so no correction is needed
    B = allele.shape[1]
    n_tiles = B // TB
    grid = (n_tiles,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((x_pad, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((y_pad, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((y_pad, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((x_pad, TB), jnp.float32),
            pltpu.VMEM((x_pad, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
        ],
        interpret=interpret,
    )(allele, read, mis, alen, rlen, coef)
    return out[0, :]


def _pow2_at_least(n):
    return 1 << max(0, int(n - 1).bit_length())


def _scatter_rows(items, B, Np):
    """Vectorized ragged-list -> [B, Np] uint8 row-major panel (zero pad):
    each item's bytes land contiguously in its own row (a column-major
    scatter was 64KB-strided per write and cost 40x the kernel)."""
    flat = np.concatenate(
        [
            np.frombuffer(x, dtype=np.uint8)
            if isinstance(x, (bytes, bytearray))
            else np.asarray(x, dtype=np.uint8)
            for x in items
        ]
    )
    lens = np.fromiter((len(x) for x in items), dtype=np.int64, count=len(items))
    pos = np.arange(lens.sum()) - np.repeat(
        np.concatenate([[0], np.cumsum(lens[:-1])]), lens
    )
    panel = np.zeros((B, Np), dtype=np.uint8)
    panel.ravel()[np.repeat(np.arange(len(items)) * Np, lens) + pos] = flat
    return panel, lens


def pack_exact_batch(alleles, reads, quals, gap):
    """Pack ragged work items into row-major uint8 device panels (the
    transpose/cast to the kernel layout happens on device in
    ``_pallas_forward``). Fully vectorized — no per-item Python loop.
    Returns (args tuple for _pallas_forward, n, Xp, Yp)."""
    n = len(alleles)
    # bucket shapes coarsely so jit programs are REUSED across pileups
    # (fine-grained padding => one Mosaic compile through the remote
    # tunnel per distinct shape combo; cf. pairhmm.py's pow2 bucketing)
    B = TB * _pow2_at_least((n + TB - 1) // TB)
    Xp = max(32, -(-max(len(a) for a in alleles) // 32) * 32)
    Yp = max(32, -(-max(len(r) for r in reads) // 32) * 32)
    allele, alens = _scatter_rows([bytes(a) for a in alleles], B, Xp)
    read, rlens = _scatter_rows(reads, B, Yp)
    qual, _ = _scatter_rows(quals, B, Yp)
    alen = np.zeros((1, B), dtype=np.int32)
    rlen = np.ones((1, B), dtype=np.int32)
    alen[0, :n] = alens
    rlen[0, :n] = np.maximum(rlens, 1)
    g_mi = math.exp(gap[0])
    g_md = math.exp(gap[1])
    t_mm = max(1.0 - g_mi - g_md, 1e-12)
    # with zero extensions, the close probabilities t_dm/t_im are exactly 1
    coef = np.array([[t_mm, g_md, g_mi, g_mi]], dtype=np.float32)
    return (allele, read, qual, alen, rlen, coef), n, Xp, Yp


def pallas_exact_forward(alleles, reads, quals, gap, interpret=False):
    """Batched forward log-probs via the Pallas column kernel.

    alleles: list[bytes]; reads: list[uint8 arrays]; quals: list[uint8];
    gap: [4] LOG gap params (t_mi, t_md, t_ii, t_dd) with t_ii/t_dd = -inf
    (caller-enforced). Returns np.float64 [n]."""
    if len(alleles) == 0:
        return np.zeros(0, dtype=np.float64)
    args, n, Xp, Yp = pack_exact_batch(alleles, reads, quals, gap)
    out = _pallas_forward(
        *(jnp.asarray(a) for a in args), Xp, Yp, interpret=interpret
    )
    res = np.asarray(out, dtype=np.float64)[:n]
    # items with a truly EMPTY read are clamped to rlen=1 in the pack; the
    # forced column there reads pad data (qual 0 -> miscall 1.0) and would
    # return a bogus positive log-prob — mask to the wavefront's -1e30
    empty = np.fromiter((len(r) == 0 for r in reads), dtype=bool, count=n)
    if empty.any():
        res[empty] = -1e30
    return res
