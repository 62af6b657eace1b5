"""Tumor mutational burden estimation.

Port of ``/root/reference/src/estimation/mutational_burden.rs:93-551``:
mutations-per-megabase above VAF cutoffs from annotated calls, as a
vega-lite JSON spec (curve / histogram / stratified table).
"""

from __future__ import annotations

import math

import numpy as np

from ..io.vcf import VcfReader, open_variant_file
from ..utils.logprob import np_log_from_phred


def collect_estimates(
    calls_path,
    events: list[str],
    sample: str,
    coding_genome_size: float = 3e7,
    mode: str = "curve",
    cutoff: float = 0.2,
):
    reader = open_variant_file(calls_path)
    records = reader.records()
    try:
        sample_idx = reader.sample_names.index(sample)
    except ValueError:
        raise ValueError(f"sample {sample} not in calls") from None

    from ..calling.variants import collect_variants

    tags = [f"PROB_{e.upper()}" for e in events]
    vafs = []
    probs = []
    vartypes = []
    for rec in records:
        ps = []
        for tag in tags:
            raw = rec.info_get(tag)
            if raw is None or raw is True:
                continue
            try:
                ps.append(np_log_from_phred(float(str(raw).split(",")[0])))
            except ValueError:
                continue
        if not ps:
            continue
        prob = math.exp(min(0.0, np.logaddexp.reduce(ps)))
        try:
            af = float(rec.samples[sample_idx].get("AF", "nan"))
        except (ValueError, IndexError):
            continue
        if af != af:
            continue
        vs = collect_variants(rec)
        vafs.append(af)
        probs.append(prob)
        vartypes.append(vs[0].kind.upper() if vs else "UNKNOWN")

    vafs = np.array(vafs)
    probs = np.array(probs)
    vartypes = np.array(vartypes)
    per_mb = 1e6 / coding_genome_size

    if mode == "multibar":
        # TMB at the cutoff, stratified by variant type
        # (mutational_burden.rs:217-247)
        data = []
        m0 = vafs >= cutoff
        for vt in sorted(set(vartypes)):
            m = m0 & (vartypes == vt)
            data.append(
                {
                    "vaf": cutoff,
                    "tmb": float(probs[m].sum() * per_mb),
                    "vartype": vt,
                    "sample": sample,
                }
            )
        return {
            "$schema": "https://vega.github.io/schema/vega-lite/v4.json",
            "data": {"values": data},
            "mark": "bar",
            "encoding": {
                "x": {"field": "vartype", "type": "nominal"},
                "y": {"field": "tmb", "type": "quantitative",
                      "title": "mutations per megabase"},
                "color": {"field": "sample", "type": "nominal"},
            },
        }

    if mode == "table":
        # TSV rows (min_vaf, tmb, vartype) over 100 cutoffs
        # (mutational_burden.rs:324-347)
        rows = ["min_vaf\ttmb\tvartype"]
        for v in np.linspace(0.0, 1.0, 100):
            m0 = vafs >= v
            for vt in sorted(set(vartypes)):
                m = m0 & (vartypes == vt)
                if m.any():
                    rows.append(f"{v:.6f}\t{probs[m].sum() * per_mb:.6f}\t{vt}")
        return {"table": "\n".join(rows)}

    if mode == "hist":
        bins = np.round(np.arange(0.0, 1.01, 0.05), 3)
        values = []
        for lo, hi in zip(bins[:-1], bins[1:]):
            m = (vafs >= lo) & (vafs < hi)
            values.append(
                {"vaf": float(lo), "tmb": float(probs[m].sum() * per_mb)}
            )
        data = values
    else:  # curve (cumulative)
        grid = np.round(np.arange(0.0, 1.01, 0.01), 3)
        data = [
            {
                "vaf": float(v),
                "tmb": float(probs[vafs >= v].sum() * per_mb),
            }
            for v in grid
        ]

    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v4.json",
        "data": {"values": data},
        "mark": "line" if mode == "curve" else "bar",
        "encoding": {
            "x": {"field": "vaf", "type": "quantitative", "title": "VAF cutoff"},
            "y": {
                "field": "tmb",
                "type": "quantitative",
                "title": "mutations per megabase",
            },
        },
    }
