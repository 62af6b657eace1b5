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


# ---------------------------------------------------------------------------
# General three-state kernel: FINITE gap extensions (nanopore / homopolymer
# profiles, GapParams pairhmm.rs:122-142 with nonzero extension probs).
#
# Same lane-transposed layout as the exact kernel (items on the 128 lanes,
# allele positions on sublanes).  The D state has a WITHIN-column first-order
# recurrence D(i,j) = t_md*M(i-1,j) + t_dd*D(i-1,j); a lane-sequential scan
# over sublanes would serialize the column, so it is solved with a
# Kogge-Stone log-shift scan: ceil(log2(Xp)) shift+FMA steps compute
# D(i) = sum_{k<i} t_dd^(i-1-k) * t_md * M(k,j) exactly (all terms positive,
# no cancellation).  The positional variant (per-base homopolymer gap
# probabilities, realignment/mod.rs:679-731 approximation) carries the
# varying extension coefficient through the scan as a running product.
# ---------------------------------------------------------------------------


def _kernel_general(allele_ref, read_ref, mis_ref, alen_ref, rlen_ref,
                    coef_ref, out_ref, mprev, iprev, dprev, i0prev, scale):
    _general_body((), allele_ref, read_ref, mis_ref, alen_ref, rlen_ref,
                  coef_ref, out_ref, mprev, iprev, dprev, i0prev, scale)


def _kernel_positional(allele_ref, read_ref, mis_ref, alen_ref, rlen_ref,
                       coef_ref, io_ref, ie_ref, do_ref, de_ref, out_ref,
                       mprev, iprev, dprev, i0prev, scale):
    _general_body((io_ref, ie_ref, do_ref, de_ref), allele_ref, read_ref,
                  mis_ref, alen_ref, rlen_ref, coef_ref, out_ref, mprev,
                  iprev, dprev, i0prev, scale)


def _general_body(pos_refs, allele_ref, read_ref, mis_ref, alen_ref,
                  rlen_ref, coef_ref, out_ref, mprev, iprev, dprev, i0prev,
                  scale):
    """General 3-state column recurrence, one tile of TB items.

    coef [1, 7] f32 SMEM: (t_mm, t_dm, t_im, t_mi, t_md, t_ii, t_dd) LINEAR.
    Positional variant (pos_refs non-empty): io/ie [Yp, TB] and do/de
    [Xp, TB] LINEAR gap probs replace the respective coef entries
    (do/de aligned like the allele panel: sublane k holds allele index k,
    the gap prob of cell i = k+1).
    Scratch: mprev/iprev/dprev [Xp, TB], i0prev/scale [1, TB].
    """
    from jax.experimental import pallas as pl

    positional = len(pos_refs) == 4
    Xp = allele_ref.shape[0]
    Yp = read_ref.shape[0]

    allele = allele_ref[:]
    alen = alen_ref[:]
    rlen = rlen_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (Xp, TB), 0)
    valid = row < alen
    validf = jnp.where(valid, 1.0, 0.0)

    if positional:
        io_ref, ie_ref, do_ref, de_ref = pos_refs
        do_p = do_ref[:]  # [Xp, TB]
        de_p = de_ref[:]
        t_md_p = do_p
        t_dd_p = de_p
        t_dm_p = 1.0 - de_p
    else:
        t_mm_c = coef_ref[0, 0]
        t_dm_c = coef_ref[0, 1]
        t_im_c = coef_ref[0, 2]
        t_mi_c = coef_ref[0, 3]
        t_md_c = coef_ref[0, 4]
        t_ii_c = coef_ref[0, 5]
        t_dd_c = coef_ref[0, 6]

    mprev[:] = jnp.zeros((Xp, TB), jnp.float32)
    iprev[:] = jnp.zeros((Xp, TB), jnp.float32)
    dprev[:] = jnp.zeros((Xp, TB), jnp.float32)
    i0prev[:] = jnp.zeros((1, TB), jnp.float32)
    scale[:] = jnp.zeros((1, TB), jnp.float32)

    def _shift(x, k):
        return jnp.concatenate(
            [jnp.zeros((k, TB), jnp.float32), x[: Xp - k, :]], axis=0
        )

    def col(j, _):
        rj = read_ref[pl.dslice(j - 1, 1), :]  # [1, TB]
        mj = mis_ref[pl.dslice(j - 1, 1), :]
        match = allele == rj
        is_n = rj == float(ord("N"))
        e_m = jnp.where(
            match,
            1.0 - mj,
            jnp.where(is_n, 0.25, mj * (1.0 / 3.0)),
        )
        e_m = jnp.where(valid, e_m, 0.0)

        if positional:
            io_j = io_ref[pl.dslice(j - 1, 1), :]  # [1, TB]
            ie_j = ie_ref[pl.dslice(j - 1, 1), :]
            t_mm = jnp.maximum(1.0 - io_j - do_p, 1e-12)  # [Xp, TB]
            t_dm = t_dm_p
            t_im = 1.0 - ie_j
            t_mi = io_j
            t_ii = ie_j
        else:
            t_mm, t_dm, t_im = t_mm_c, t_dm_c, t_im_c
            t_mi, t_ii = t_mi_c, t_ii_c

        m_p = mprev[:]
        i_p = iprev[:]
        d_p = dprev[:]
        i0_p = i0prev[:]

        is_j1 = (j == 1)
        startm = jnp.where(is_j1, jnp.exp(-scale[:]), 0.0)  # [1, TB]
        ihead = jnp.concatenate([i0_p, i_p[: Xp - 1, :]], axis=0)
        mcol = e_m * (
            t_mm * _shift(m_p, 1) + t_dm * _shift(d_p, 1) + t_im * ihead
            + startm
        )
        start_i = jnp.where(is_j1, mj * t_mi, 0.0)
        icol = mj * (t_mi * m_p + t_ii * i_p) + start_i * validf
        i0col = mj * t_ii * i0_p + start_i

        # per-item rescale
        colmax = jnp.maximum(
            jnp.max(mcol, axis=0, keepdims=True),
            jnp.max(icol, axis=0, keepdims=True),
        )
        need = (colmax > 0.0) & (colmax < RESCALE_THRESH)
        f = jnp.where(need, RESCALE, 1.0)
        mcol = mcol * f
        icol = icol * f
        i0col = i0col * f
        scale[:] = scale[:] + jnp.where(need, math.log(RESCALE), 0.0)

        # within-column D via Kogge-Stone log-shift scan
        if positional:
            d = t_md_p * _shift(mcol, 1)
            a = t_dd_p
            s = 1
            while s < Xp:
                d = d + a * _shift(d, s)
                a = a * _shift(a, s)
                s *= 2
        else:
            d = t_md_c * _shift(mcol, 1)
            s = 1
            fac = t_dd_c
            while s < Xp:
                d = d + fac * _shift(d, s)
                fac = fac * fac
                s *= 2

        at_end = rlen == j
        fin = (
            jnp.sum(mcol, axis=0, keepdims=True)
            + jnp.sum(icol, axis=0, keepdims=True)
            + i0col
        )
        out_ref[:] = jnp.where(
            at_end,
            jnp.where(fin > 0.0, jnp.log(jnp.maximum(fin, 1e-300)), -1e30)
            - scale[:],
            out_ref[:],
        )

        mprev[:] = mcol
        iprev[:] = icol
        dprev[:] = d
        i0prev[:] = i0col
        return 0

    out_ref[:] = jnp.full((1, TB), -1e30, jnp.float32)
    jax.lax.fori_loop(1, Yp + 1, col, 0)


@partial(jax.jit, static_argnames=("x_pad", "y_pad", "interpret"))
def _pallas_forward_general(allele_u8, read_u8, qual_u8, alen, rlen, coef,
                            x_pad, y_pad, interpret=False):
    """Constant finite-extension forward (row-major uint8 host panels,
    device-side transpose/cast as in ``_pallas_forward``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    allele = (allele_u8 & np.uint8(0xDF)).T.astype(jnp.float32)
    read = (read_u8 & np.uint8(0xDF)).T.astype(jnp.float32)
    mis = jnp.exp(
        qual_u8.T.astype(jnp.float32) * jnp.float32(-math.log(10.0) / 10.0)
    )
    B = allele.shape[1]
    grid = (B // TB,)
    out = pl.pallas_call(
        _kernel_general,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((x_pad, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((y_pad, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((y_pad, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((x_pad, TB), jnp.float32),
            pltpu.VMEM((x_pad, TB), jnp.float32),
            pltpu.VMEM((x_pad, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
        ],
        interpret=interpret,
    )(allele, read, mis, alen, rlen, coef)
    return out[0, :]


@partial(jax.jit, static_argnames=("x_pad", "y_pad", "interpret"))
def _pallas_forward_positional(allele_u8, read_u8, qual_u8, alen, rlen,
                               io, ie, do, de, x_pad, y_pad,
                               interpret=False):
    """Positional-gap forward: io/ie [B, Yp] f32 LINEAR per-read-base
    insertion open/extend probs; do/de [B, Xp] per-allele-base deletion
    probs (index k = gap prob of cell i = k+1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    allele = (allele_u8 & np.uint8(0xDF)).T.astype(jnp.float32)
    read = (read_u8 & np.uint8(0xDF)).T.astype(jnp.float32)
    mis = jnp.exp(
        qual_u8.T.astype(jnp.float32) * jnp.float32(-math.log(10.0) / 10.0)
    )
    coef = jnp.zeros((1, 7), jnp.float32)
    B = allele.shape[1]
    grid = (B // TB,)
    xspec = pl.BlockSpec((x_pad, TB), lambda t: (0, t), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((y_pad, TB), lambda t: (0, t), memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, TB), lambda t: (0, t), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel_positional,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        grid=grid,
        in_specs=[
            xspec, yspec, yspec, rowspec, rowspec,
            pl.BlockSpec((1, 7), lambda t: (0, 0), memory_space=pltpu.SMEM),
            yspec, yspec, xspec, xspec,
        ],
        out_specs=rowspec,
        scratch_shapes=[
            pltpu.VMEM((x_pad, TB), jnp.float32),
            pltpu.VMEM((x_pad, TB), jnp.float32),
            pltpu.VMEM((x_pad, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
        ],
        interpret=interpret,
    )(allele, read, mis, alen, rlen, coef, io.T, ie.T, do.T, de.T)
    return out[0, :]


def pallas_general_forward(alleles, reads, quals, gap, interpret=False):
    """Batched finite-extension forward via the general Pallas kernel.

    gap: [4] LOG params (t_mi, t_md, t_ii, t_dd), extensions finite.
    Returns np.float64 [n]."""
    if len(alleles) == 0:
        return np.zeros(0, dtype=np.float64)
    args, n, Xp, Yp = pack_exact_batch(alleles, reads, quals, (gap[0], gap[1]))
    allele, read, qual, alen, rlen, _ = args
    g_mi = math.exp(gap[0])
    g_md = math.exp(gap[1])
    g_ii = math.exp(gap[2])
    g_dd = math.exp(gap[3])
    coef = np.array(
        [[
            max(1.0 - g_mi - g_md, 1e-12),  # t_mm
            max(1.0 - g_dd, 1e-12),         # t_dm
            max(1.0 - g_ii, 1e-12),         # t_im
            g_mi,                            # t_mi
            g_md,                            # t_md
            g_ii,                            # t_ii
            g_dd,                            # t_dd
        ]],
        dtype=np.float32,
    )
    out = _pallas_forward_general(
        *(jnp.asarray(a) for a in (allele, read, qual, alen, rlen, coef)),
        Xp, Yp, interpret=interpret,
    )
    res = np.asarray(out, dtype=np.float64)[:n]
    empty = np.fromiter((len(r) == 0 for r in reads), dtype=bool, count=n)
    if empty.any():
        res[empty] = -1e30
    return res


def pallas_positional_forward(alleles, reads, quals, io, ie, do, de,
                              interpret=False):
    """Positional-gap (homopolymer-aware) forward via the general kernel.

    io/ie: [n, >=rlen_max] LOG per-read-base insertion open/extend;
    do/de: [n, >=alen_max] LOG per-allele-base deletion open/extend
    (NEG_INF padding).  Returns np.float64 [n]."""
    if len(alleles) == 0:
        return np.zeros(0, dtype=np.float64)
    args, n, Xp, Yp = pack_exact_batch(alleles, reads, quals, (0.0, 0.0))
    allele, read, qual, alen, rlen, _ = args
    B = allele.shape[0]

    def _linpanel(log_rows, Np):
        panel = np.zeros((B, Np), dtype=np.float32)
        for b in range(n):
            r = np.asarray(log_rows[b], dtype=np.float32)[:Np]
            with np.errstate(over="ignore"):
                panel[b, : len(r)] = np.exp(r)
        return panel

    io_p = _linpanel(io, Yp)
    ie_p = _linpanel(ie, Yp)
    do_p = _linpanel(do, Xp)
    de_p = _linpanel(de, Xp)
    out = _pallas_forward_positional(
        *(jnp.asarray(a) for a in (allele, read, qual, alen, rlen)),
        jnp.asarray(io_p), jnp.asarray(ie_p), jnp.asarray(do_p),
        jnp.asarray(de_p), Xp, Yp, interpret=interpret,
    )
    res = np.asarray(out, dtype=np.float64)[:n]
    empty = np.fromiter((len(r) == 0 for r in reads), dtype=bool, count=n)
    if empty.any():
        res[empty] = -1e30
    return res
