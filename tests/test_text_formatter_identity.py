"""The vectorized text formatter (fastcall.format_window_text) must be
BYTE-identical to VcfWriter.write over format_window's records — same
engine outputs, two formatting paths (the docstring's claim, as a test)."""

import numpy as np
import pytest

from varlociraptor_tpu.calling.call import CallOptions, call_generic
from varlociraptor_tpu.calling.observations import ObservationWriter
from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario

from test_columnar_call import _dataset  # noqa: E402


def test_text_formatter_byte_identical(tmp_path, monkeypatch):
    data = _dataset(seed=29, n=80)
    scenario = tumor_normal_scenario(0.75)
    obs = {}
    for si, name in enumerate(scenario.sample_names):
        path = tmp_path / f"{name}.obs.jsonl"
        with ObservationWriter(path, name) as w:
            for v, ps in data:
                w.write_record(v, ps[si])
        obs[name] = path

    out_text = tmp_path / "text.vcf"
    call_generic(scenario, obs, out_text, CallOptions())

    # force the record path: wrap the writer in a subclass so the
    # `type(w) is VcfWriter` text fast-path check fails
    import varlociraptor_tpu.calling.call as callmod
    from varlociraptor_tpu.io.vcf import VcfWriter

    class _SubWriter(VcfWriter):
        pass

    orig_open = callmod.open_variant_writer

    def sub_open(path, **kw):
        if str(path).endswith("records.vcf"):
            return _SubWriter(path, **kw)
        return orig_open(path, **kw)

    monkeypatch.setattr(callmod, "open_variant_writer", sub_open)
    out_rec = tmp_path / "records.vcf"
    call_generic(scenario, obs, out_rec, CallOptions())

    assert out_text.read_bytes() == out_rec.read_bytes()
