"""Two-sample VAF scatter plot (vega-lite).

Port of ``/root/reference/src/estimation/sample_variants.rs:18-99``.
"""

from __future__ import annotations

from ..io.vcf import VcfReader, open_variant_file


def vaf_scatter(calls_path, sample_x: str, sample_y: str):
    reader = open_variant_file(calls_path)
    records = reader.records()
    ix = reader.sample_names.index(sample_x)
    iy = reader.sample_names.index(sample_y)
    values = []
    for rec in records:
        try:
            x = float(rec.samples[ix].get("AF", "nan"))
            y = float(rec.samples[iy].get("AF", "nan"))
        except (ValueError, IndexError):
            continue
        if x == x and y == y:
            values.append({sample_x: x, sample_y: y})
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v4.json",
        "data": {"values": values},
        "mark": "point",
        "encoding": {
            "x": {"field": sample_x, "type": "quantitative"},
            "y": {"field": sample_y, "type": "quantitative"},
        },
    }
