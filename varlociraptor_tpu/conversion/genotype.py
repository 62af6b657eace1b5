"""Derive diploid GT from MAP allele frequencies.

Port of ``/root/reference/src/conversion/genotype.rs``: AF >= 0.75 -> 1/1,
AF >= 0.25 -> 0/1, else 0/0 (missing AF -> ./.).
"""

from __future__ import annotations

from ..io.vcf import VcfReader, open_variant_file, VcfWriter, open_variant_writer


def af_to_gt(af: float | None) -> str:
    if af is None:
        return "./."
    if af >= 0.75:
        return "1/1"
    if af >= 0.25:
        return "0/1"
    return "0/0"


def genotype(in_path, out_path=None):
    reader = open_variant_file(in_path)
    records = reader.records()
    header = reader.header_lines + [
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype from MAP AF">'
    ]
    with open_variant_writer(out_path, sample_names=reader.sample_names, header_lines=header) as w:
        for rec in records:
            if "GT" not in rec.format:
                rec.format = ["GT"] + rec.format
            for s in rec.samples:
                try:
                    af = float(s.get("AF", "nan"))
                    af = None if af != af else af
                except ValueError:
                    af = None
                s["GT"] = af_to_gt(af)
            w.write(rec)
