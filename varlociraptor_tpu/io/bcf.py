"""BCF 2.x reader (uncompressed or BGZF), yielding VcfRecord objects.

Covers the candidate/call I/O parity with the reference's rust-htslib BCF
usage for reading.  Site-level fields (CHROM/POS/ID/REF/ALT/FILTER/INFO) are
decoded; per-sample FORMAT blocks are skipped (candidates only need sites).
"""

from __future__ import annotations

import re
import struct
from pathlib import Path

import numpy as np

from .bam import _decode_bgzf
from .vcf import VcfRecord

_MISSING_INT8 = -128
_MISSING_INT16 = -32768
_MISSING_INT32 = -2147483648


class BcfReader:
    def __init__(self, path):
        self.path = Path(path)
        raw = self.path.read_bytes()
        if raw[:2] == b"\x1f\x8b":
            raw = _decode_bgzf(raw)
        if raw[:3] != b"BCF":
            raise ValueError(f"{path} is not BCF")
        # magic BCF\major\minor
        l_text = struct.unpack_from("<I", raw, 5)[0]
        self.header_text = raw[9 : 9 + l_text].rstrip(b"\x00").decode("latin1")
        self._pos = 9 + l_text
        self._raw = raw
        self._parse_header()

    def _parse_header(self):
        self.header_lines = [
            l for l in self.header_text.split("\n") if l.startswith("##")
        ]
        self.sample_names = []
        for line in self.header_text.split("\n"):
            if line.startswith("#CHROM"):
                cols = line.split("\t")
                self.sample_names = cols[9:]
        # contig dictionary
        self.contigs = []
        contig_idx = {}
        # string dictionary (FILTER/INFO/FORMAT ids)
        strings = {}
        order = 0
        if not any(
            re.match(r"##FILTER=<ID=PASS", l) for l in self.header_lines
        ):
            strings[0] = "PASS"
            order = 1
        seen = {"PASS"} if 0 in strings else set()
        for line in self.header_lines:
            m = re.match(r"##contig=<([^>]*)>", line)
            if m:
                name = None
                idx = None
                for kv in re.findall(r"(\w+)=([^,>]+)", m.group(1)):
                    if kv[0] == "ID":
                        name = kv[1]
                    elif kv[0] == "IDX":
                        idx = int(kv[1])
                if name is not None:
                    if idx is None:
                        idx = len(contig_idx)
                    contig_idx[idx] = name
                continue
            m = re.match(r"##(FILTER|INFO|FORMAT)=<(.*)>", line)
            if m:
                name = None
                idx = None
                for kv in re.findall(r"(\w+)=([^,>\"]+|\"[^\"]*\")", m.group(2)):
                    if kv[0] == "ID":
                        name = kv[1]
                    elif kv[0] == "IDX":
                        idx = int(kv[1])
                if name is None or name in seen:
                    continue
                seen.add(name)
                if idx is None:
                    idx = order
                strings[idx] = name
                order = max(order, idx) + 1
        self._strings = strings
        self._contigs = contig_idx

    # ------------------------------------------------------------------
    def _typed(self, pos):
        """Decode one typed value; returns (value, new_pos)."""
        desc = self._raw[pos]
        pos += 1
        typ = desc & 0x0F
        count = desc >> 4
        if count == 15:
            count, pos = self._typed(pos)
            count = int(count[0]) if isinstance(count, (list, np.ndarray)) else int(count)
        if typ == 0:
            return [], pos
        if typ == 1:
            vals = np.frombuffer(self._raw, np.int8, count, pos)
            return vals, pos + count
        if typ == 2:
            vals = np.frombuffer(self._raw, "<i2", count, pos)
            return vals, pos + 2 * count
        if typ == 3:
            vals = np.frombuffer(self._raw, "<i4", count, pos)
            return vals, pos + 4 * count
        if typ == 5:
            vals = np.frombuffer(self._raw, "<f4", count, pos)
            return vals, pos + 4 * count
        if typ == 7:
            s = self._raw[pos : pos + count].decode("latin1")
            return s, pos + count
        raise ValueError(f"bad BCF type {typ}")

    def __iter__(self):
        pos = self._pos
        raw = self._raw
        n = len(raw)
        while pos + 8 <= n:
            l_shared, l_indiv = struct.unpack_from("<II", raw, pos)
            rec_start = pos + 8
            p = rec_start
            chrom_id, rpos, _rlen = struct.unpack_from("<iii", raw, p)
            qual = struct.unpack_from("<f", raw, p + 12)[0]
            n_info_allele = struct.unpack_from("<I", raw, p + 16)[0]
            n_info = n_info_allele & 0xFFFF
            n_allele = n_info_allele >> 16
            p += 24  # skip n_fmt_sample too
            vid, p = self._typed(p)
            alleles = []
            for _ in range(n_allele):
                a, p = self._typed(p)
                alleles.append(a if isinstance(a, str) else "")
            filters, p = self._typed(p)
            info = {}
            for _ in range(n_info):
                key_idx, p = self._typed(p)
                key_idx = int(np.asarray(key_idx).ravel()[0])
                val, p = self._typed(p)
                name = self._strings.get(key_idx, f"KEY{key_idx}")
                if isinstance(val, str):
                    info[name] = val
                elif len(val) == 0:
                    info[name] = True  # flag
                elif len(val) == 1:
                    v = val[0]
                    info[name] = (
                        float(v) if val.dtype.kind == "f" else int(v)
                    )
                else:
                    info[name] = [
                        float(v) if val.dtype.kind == "f" else int(v) for v in val
                    ]
            pos = rec_start + l_shared + l_indiv
            yield VcfRecord(
                chrom=self._contigs.get(chrom_id, str(chrom_id)),
                pos=rpos,
                id=vid if isinstance(vid, str) and vid else ".",
                ref=alleles[0] if alleles else "N",
                alts=list(alleles[1:]),
                qual="." if np.isnan(qual) else f"{qual:g}",
                filter=".",
                info=info,
            )

    def records(self):
        return list(self)
