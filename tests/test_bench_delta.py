"""bench.py delta-report robustness against driver-wrapped artifacts.

Round 7's driver artifact recorded rc=1: BENCH_r06.json carries
``"parsed": null`` (the driver failed to parse that round's stdout
line) and ``prev.get("parsed", prev)`` returned None, crashing AFTER
the result line was emitted. These tests feed ``delta_report`` every
artifact shape the driver has produced so the crash class stays dead.
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()
TIMES = {"q1": 0.5, "q2": 0.25}


def test_missing_file_is_empty(tmp_path):
    assert bench.delta_report(tmp_path / "nope.json", TIMES, 0.75, 0.1) == ""


def test_parsed_null_does_not_raise(tmp_path):
    # the exact r06 shape that crashed round 7
    p = tmp_path / "BENCH_r06.json"
    p.write_text(json.dumps({"n": 6, "rc": 0, "parsed": None, "tail": "x"}))
    out = bench.delta_report(p, TIMES, 0.75, 0.1)
    assert out == ""  # no sf match in the unparsed wrapper — silent skip


def test_driver_wrapped_parsed(tmp_path):
    p = tmp_path / "BENCH_r07.json"
    inner = {"sf": 0.1, "value": 1.0, "queries": {"q1": 0.6, "q2": 0.2}}
    p.write_text(json.dumps({"n": 7, "rc": 0, "parsed": inner}))
    out = bench.delta_report(p, TIMES, 0.75, 0.1)
    assert "q1: 0.500s vs 0.600s (-0.100)" in out
    assert "q2: 0.250s vs 0.200s (+0.050)" in out


def test_raw_stdout_shape(tmp_path):
    p = tmp_path / "BENCH_prev.json"
    p.write_text(json.dumps({"sf": 0.1, "value": 2.0, "queries": {"q1": 1.0}}))
    out = bench.delta_report(p, TIMES, 0.75, 0.1)
    assert "q1" in out and "q2" not in out


def test_sf_mismatch_is_empty(tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps({"sf": 1.0, "value": 2.0, "queries": {"q1": 1.0}}))
    assert bench.delta_report(p, TIMES, 0.75, 0.1) == ""


def test_garbage_shapes_never_raise(tmp_path):
    for i, payload in enumerate(
        ["null", "[]", '"str"', "{}", '{"parsed": []}', "not json"]
    ):
        p = tmp_path / f"g{i}.json"
        p.write_text(payload)
        out = bench.delta_report(p, TIMES, 0.75, 0.1)
        assert isinstance(out, str)


def test_latest_prev_bench_sorts_numerically(tmp_path):
    """r100 must beat r99 — lexicographic sort would pick r99 forever
    once the round number outgrows the padded width."""
    for n in (7, 99, 100):
        (tmp_path / f"BENCH_r{n}.json").write_text("{}")
    (tmp_path / "BENCH_rX.json").write_text("{}")  # unparsable: ignored
    assert bench._latest_prev_bench(tmp_path) == "BENCH_r100.json"
