"""Device-mesh sharding of the calling workload.

The workload's parallel axis is candidate loci (SURVEY.md §2.9): every locus
is an independent Bayesian evaluation, so the engine batch dimension L is
sharded data-parallel over the mesh ("dp" axis) with `jax.sharding`.  Within
a locus the heavy axes (grid x grid pair contraction, depth reduction) stay
on-chip; XLA inserts no collectives for the forward pass, and cross-shard
merges (global FDR statistics, calls gather) ride `all_gather`/`psum` on ICI.

The reference has no distributed backend (single process, SURVEY §2.9);
users shard by genome region via candidate BCFs.  Here sharding is
first-class: the same engine runs 1-chip or pod-slice by swapping the mesh.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def locus_mesh(devices=None, axis: str = "loci") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, 0
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths), pad


def shard_engine_inputs(mesh: Mesh, *arrays, axis_name: str = "loci"):
    """Pad batch dim and lay out with locus sharding.

    Single process: pads to the device count and device_puts the full
    batch.  Multi-process (true multi-host): each process passes its OWN
    local loci block (all processes must pass equal-sized blocks); blocks
    are padded to the local device count and assembled into the global
    array from process-local shards."""
    n_proc = jax.process_count()
    n_pad_unit = mesh.devices.size // n_proc if n_proc > 1 else mesh.devices.size
    out = []
    pad = 0
    for arr in arrays:
        padded, pad = pad_to_multiple(np.asarray(arr), n_pad_unit, axis=0)
        sharding = NamedSharding(mesh, P(axis_name, *([None] * (padded.ndim - 1))))
        out.append(_put_global(padded, sharding))
    return out, pad


def run_sharded(engine, mesh, feats, mask, bias_alt, bias_ref, bias_any,
                combo_active, branch_gates, ln_prior_absent,
                n_artifact_active=None):
    """Run a PosteriorEngine over a locus batch sharded across the mesh.

    Returns host numpy outputs with padding stripped.
    """
    L0 = np.asarray(feats).shape[0]
    if n_artifact_active is None:
        n_artifact_active = np.full(
            L0, float(engine.n_artifact_combos or 1), dtype=np.float32
        )
    arrays, pad = shard_engine_inputs(
        mesh,
        np.asarray(feats, dtype=np.float32),
        np.asarray(mask),
        np.asarray(bias_alt, dtype=np.float32),
        np.asarray(bias_ref, dtype=np.float32),
        np.asarray(bias_any, dtype=np.float32),
        np.asarray(combo_active),
        np.asarray(branch_gates),
        np.asarray(ln_prior_absent, dtype=np.float32),
        np.asarray(n_artifact_active, dtype=np.float32),
    )
    out = engine._run(*arrays[:-1], None, arrays[-1])
    # NOTE: this path fetches per-output (several round trips) rather than
    # the single packed f32+i16 protocol engine.run() uses — the packed
    # flat-buffer layout does not shard cleanly along the locus axis.
    # `joint` is derived host-side instead of fetched.
    out = {k: v for k, v in out.items() if k != "joint"}
    L = np.asarray(feats).shape[0]
    if jax.process_count() > 1:
        # outputs are loci-sharded; each process materializes only ITS
        # addressable rows (its own loci block), in device order
        def local_rows(v):
            shards = sorted(
                v.addressable_shards, key=lambda s: s.index[0].start or 0
            )
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

        out = {k: local_rows(v)[:L] for k, v in out.items()}
    else:
        out = {k: np.asarray(v)[:L] for k, v in out.items()}
    # _run ships the AFD as compact per-sample top-K blocks [L, sum Ki];
    # expand to the shared-grid [L, S, G] layout the callers consume
    out["densities_dphred"] = engine.expand_afd(
        out["densities_dphred"], out.pop("afd_idx")
    )
    out["joint"] = out["posteriors"] + out["marginal"][:, None]
    # the packed single-device wire ships only the argmax slot; derive the
    # same reduction host-side so both paths expose identical keys
    out["map_slot"] = np.argmax(out.pop("combo_joint"), axis=1)
    out["n_obs"] = np.asarray(mask).sum(axis=-1)
    return out


def run_sharded_compact(engine, mesh, obs_f16, obs_u8, hil, mask, slot_map,
                        combo_active, branch_gates, ln_prior_absent,
                        fwd_rate, has_alt_loci, ln_prior_joint=None,
                        n_artifact_active=None):
    """Compact-wire twin of :func:`run_sharded`: the f16/u8 observation
    encoding (ops.compact_obs) is sharded along the locus axis and feature
    expansion + bias factors run on each shard's device — the same program
    the single-device columnar path jits, so outputs are bit-identical."""
    import numpy as _np

    L0 = _np.asarray(obs_f16).shape[0]
    if n_artifact_active is None:
        n_artifact_active = _np.full(
            L0, float(engine.n_artifact_combos or 1), dtype=_np.float32
        )
    inputs = [
        _np.asarray(obs_f16, dtype=_np.float16),
        _np.asarray(obs_u8, dtype=_np.uint8),
        _np.asarray(hil, dtype=_np.int8),
        _np.asarray(mask),
        _np.asarray(slot_map, dtype=_np.int32),
        _np.asarray(combo_active),
        _np.asarray(branch_gates),
        _np.asarray(ln_prior_absent, dtype=_np.float32),
        _np.asarray(fwd_rate, dtype=_np.float32),
        _np.asarray(has_alt_loci),
    ]
    if ln_prior_joint is not None:
        inputs.append(_np.asarray(ln_prior_joint, dtype=_np.float32))
    inputs.append(_np.asarray(n_artifact_active, dtype=_np.float32))
    arrays, pad = shard_engine_inputs(mesh, *inputs)
    fn = engine.run_compact_unpacked()
    if ln_prior_joint is not None:
        out = fn(*arrays[:-1], arrays[-1])
    else:
        out = fn(*arrays[:-1], None, arrays[-1])
    out = {k: v for k, v in out.items() if k != "joint"}
    if jax.process_count() > 1:
        def local_rows(v):
            shards = sorted(
                v.addressable_shards, key=lambda s: s.index[0].start or 0
            )
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

        out = {k: local_rows(v)[:L0] for k, v in out.items()}
    else:
        out = {k: np.asarray(v)[:L0] for k, v in out.items()}
    out["densities_dphred"] = engine.expand_afd(
        out["densities_dphred"], out.pop("afd_idx")
    )
    out["joint"] = out["posteriors"] + out["marginal"][:, None]
    out["map_slot"] = _np.argmax(out.pop("combo_joint"), axis=1)
    out["n_obs"] = _np.asarray(mask).sum(axis=-1)
    return out


def distributed_mesh(axis: str = "loci") -> Mesh:
    """Mesh over every addressable device; initializes jax.distributed when
    the standard coordinator env vars are present (multi-host pods over
    DCN).  Single-process runs get the local-device mesh unchanged."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ and not getattr(
        distributed_mesh, "_initialized", False
    ):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        distributed_mesh._initialized = True
    return locus_mesh(jax.devices(), axis=axis)


def _put_global(bits: np.ndarray, sharding):
    """device_put for single-process meshes; build-from-local-shards for
    multi-process (DCN) meshes, where each process only provides the rows
    of its own addressable devices."""
    if jax.process_count() == 1:
        return jax.device_put(bits, sharding)
    return jax.make_array_from_process_local_data(sharding, bits)


def all_gather_rows(local_rows: np.ndarray, mesh, axis: str = "loci"):
    """Collective gather of per-shard row blocks -> replicated full array.

    The one cross-shard reduction the pipeline needs (global FDR statistics,
    SURVEY.md §3.3): each shard contributes a [rows_i, C] block; blocks are
    padded to the max row count, laid out [n_shards, max_rows, C] sharded on
    the shard axis, and an ``all_gather`` over the mesh axis replicates the
    full tensor.  Returns the concatenated [sum rows_i, C] numpy array in
    shard order (NaN-row padding stripped).

    Multi-process (true multi-host over DCN): every process calls this with
    ITS OWN rows; the rows are spread over the process's addressable
    devices, the count agreement and the gather ride the same collective,
    and every process returns the identical full array.
    """
    from jax import shard_map

    n_proc = jax.process_count()
    n_local = mesh.devices.size // n_proc if n_proc > 1 else mesh.devices.size
    n_dev = mesh.devices.size
    blocks = np.array_split(np.asarray(local_rows, dtype=np.float64), n_local)
    if n_proc > 1:
        # agree on the global max row count (+ per-device row counts) with
        # a first all_gather of the counts
        counts_local = np.array(
            [[b.shape[0]] for b in blocks], dtype=np.int32
        )  # [n_local, 1]
        csharding = NamedSharding(mesh, P(axis, None))
        carr = _put_global(counts_local, csharding)

        @jax.jit
        def gather_counts(x):
            def f(blk):
                return jax.lax.all_gather(blk, axis, tiled=True)

            return shard_map(
                f,
                mesh=mesh,
                in_specs=P(axis, None),
                out_specs=P(None, None),
                check_vma=False,
            )(x)

        all_counts = np.asarray(gather_counts(carr))[:, 0]  # [n_dev]
        max_rows = int(all_counts.max()) if n_dev else 0
    else:
        all_counts = np.array([b.shape[0] for b in blocks], dtype=np.int32)
        max_rows = max((b.shape[0] for b in blocks), default=0)
    C = local_rows.shape[1] if local_rows.ndim == 2 else 1
    stacked = np.zeros((n_local, max(max_rows, 1), C), dtype=np.float64)
    for i, b in enumerate(blocks):
        stacked[i, : b.shape[0]] = b.reshape(b.shape[0], C)
    # carry the f64 BITS as int32 pairs: device arrays default to f32
    # (jax_enable_x64 off), which would silently round the statistics and
    # shift FDR thresholds at the last ulp
    bits = stacked.view(np.int32).reshape(n_local, max(max_rows, 1), C * 2)
    sharding = NamedSharding(mesh, P(axis, None, None))
    x = _put_global(bits, sharding)

    @jax.jit
    def gather(x):
        def f(blk):  # blk [1, max_rows, C] per shard
            return jax.lax.all_gather(blk, axis, tiled=True)

        return shard_map(
            f,
            mesh=mesh,
            in_specs=P(axis, None, None),
            out_specs=P(None, None, None),
            check_vma=False,
        )(x)

    full = (
        np.ascontiguousarray(np.asarray(gather(x)))
        .view(np.float64)
        .reshape(n_dev, max(max_rows, 1), C)
    )  # replicated, bit-exact
    rows = []
    for i in range(n_dev):
        rows.append(full[i, : all_counts[i]])
    out = np.concatenate(rows, axis=0) if rows else np.zeros((0, C))
    return out if local_rows.ndim == 2 else out[:, 0]
