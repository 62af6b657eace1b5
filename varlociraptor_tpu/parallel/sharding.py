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
    """Pad batch dim to mesh size and device_put with locus sharding."""
    n_dev = mesh.devices.size
    out = []
    pad = 0
    for arr in arrays:
        padded, pad = pad_to_multiple(np.asarray(arr), n_dev, axis=0)
        sharding = NamedSharding(mesh, P(axis_name, *([None] * (padded.ndim - 1))))
        out.append(jax.device_put(padded, sharding))
    return out, pad


def run_sharded(engine, mesh, feats, mask, bias_alt, bias_ref, bias_any,
                combo_active, branch_gates, ln_prior_absent):
    """Run a PosteriorEngine over a locus batch sharded across the mesh.

    Returns host numpy outputs with padding stripped.
    """
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
    )
    out = engine._run(*arrays)
    L = np.asarray(feats).shape[0]
    return {k: np.asarray(v)[:L] for k, v in out.items()}
