"""Decode the reference's serialized observations embedded in testcase
candidates (INFO arrays of u16-packed bincode, preprocessing/mod.rs:921-1038).

Each INFO field (PROB_MAPPING, PROB_REF, ...) is a flat list of u16 values:
  - first 4 u16 = u64 element count (little endian)
  - then per element, a bincode enum MiniLogProb: tag u32 (2 u16),
    0 -> F16 payload (1 u16), 1 -> F32 payload (2 u16)
Plain integer fields (STRAND, READ_ORIENTATION, ...) are bincode of small
enums/ints with the same 4-u16 count prefix.

Usage: python scripts/decode_ref_obs.py CANDIDATES.vcf [FIELD ...]
"""

import struct
import sys


def u16s(vals):
    return [int(v) & 0xFFFF for v in vals]


def decode_minilogprob_array(vals):
    v = u16s(vals)
    n = v[0] | (v[1] << 16) | (v[2] << 32) | (v[3] << 48)
    out = []
    i = 4
    for _ in range(n):
        tag = v[i] | (v[i + 1] << 16)
        i += 2
        if tag == 0:
            (h,) = struct.unpack("<e", struct.pack("<H", v[i]))
            i += 1
            out.append(float(h))
        elif tag == 1:
            (f,) = struct.unpack("<f", struct.pack("<HH", v[i], v[i + 1]))
            i += 2
            out.append(float(f))
        else:
            raise ValueError(f"bad MiniLogProb tag {tag} at {i}")
    return out


def decode_u32_array(vals):
    """bincode Vec<u32-ish enum>: count prefix then one u32 (2 u16) each."""
    v = u16s(vals)
    n = v[0] | (v[1] << 16) | (v[2] << 32) | (v[3] << 48)
    out = []
    i = 4
    for _ in range(n):
        out.append(v[i] | (v[i + 1] << 16))
        i += 2
    return out


FLOAT_FIELDS = {
    "PROB_MAPPING",
    "PROB_REF",
    "PROB_ALT",
    "PROB_MISSED_ALLELE",
    "PROB_SAMPLE_ALT",
    "PROB_DOUBLE_OVERLAP",
    "PROB_HIT_BASE",
}


def parse_info(info: str) -> dict:
    d = {}
    for item in info.split(";"):
        if "=" not in item:
            continue
        k, val = item.split("=", 1)
        try:
            d[k] = [int(x) for x in val.split(",")]
        except ValueError:
            d[k] = val
    return d


def decode_record_obs(info: str) -> dict:
    d = parse_info(info)
    out = {}
    for k, vals in d.items():
        if not isinstance(vals, list):
            continue
        try:
            if k in FLOAT_FIELDS:
                out[k] = decode_minilogprob_array(vals)
            else:
                out[k] = decode_u32_array(vals)
        except (ValueError, IndexError, struct.error):
            pass
    return out


def main():
    path = sys.argv[1]
    fields = sys.argv[2:] or None
    for line in open(path):
        if line.startswith("#"):
            continue
        cols = line.rstrip("\n").split("\t")
        obs = decode_record_obs(cols[7])
        print(f"{cols[0]}:{cols[1]} {cols[3]}>{cols[4]}")
        for k, v in obs.items():
            if fields and k not in fields:
                continue
            print(f"  {k} (n={len(v)}): {[round(x, 4) if isinstance(x, float) else x for x in v[:20]]}")


if __name__ == "__main__":
    main()
