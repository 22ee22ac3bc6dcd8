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


DIAG_Q = {
    "q1": {"steady_min_sec": 0.50, "steady_max_sec": 0.60},  # spread .10
    "q2": {"steady_min_sec": 0.20, "steady_max_sec": 0.25},  # spread .05
}


def test_drift_within_noise():
    """|delta| ≤ summed per-query steady spread → within_noise (the r8
    +33% class would have been self-evident with this verdict)."""
    v = bench.drift_verdict(1.0, 1.1, DIAG_Q)  # delta .10 ≤ budget .15
    assert v["verdict"] == "within_noise"
    assert v["noise_budget_sec"] == 0.15
    assert v["delta_sec"] == 0.1


def test_drift_exceeds_noise_slower_and_faster():
    slow = bench.drift_verdict(1.0, 1.3, DIAG_Q)  # delta .30 > .15
    assert slow["verdict"] == "exceeds_noise:slower"
    fast = bench.drift_verdict(1.5, 1.0, DIAG_Q)  # delta -.50
    assert fast["verdict"] == "exceeds_noise:faster"
    assert fast["delta_sec"] == -0.5


def test_drift_no_prior_and_missing_spread_keys():
    assert bench.drift_verdict(None, 1.0, DIAG_Q)["verdict"] == "no_prior"
    assert bench.drift_verdict(0.0, 1.0, DIAG_Q)["verdict"] == "no_prior"
    # diag rows without spread keys (REST API unavailable) count as 0
    v = bench.drift_verdict(1.0, 1.0, {"q1": {}})
    assert v["verdict"] == "within_noise" and v["noise_budget_sec"] == 0.0


def test_prev_total_shapes(tmp_path):
    p = tmp_path / "BENCH_r08.json"
    p.write_text(json.dumps({"parsed": {"sf": 0.1, "value": 6.494}}))
    assert bench.prev_total(p, 0.1) == 6.494
    assert bench.prev_total(p, 1.0) is None  # sf mismatch
    p2 = tmp_path / "null.json"
    p2.write_text(json.dumps({"parsed": None}))
    assert bench.prev_total(p2, 0.1) is None
    assert bench.prev_total(tmp_path / "absent.json", 0.1) is None


def test_core_contract_reports_env_and_parallelism(spark, monkeypatch):
    """r10 verdict item 1: the stdout line must self-identify the
    session width — the raw $SPARK_GRAFT_CPUS value and the live
    defaultParallelism — so the driver's c8/c32 scaling probe can
    verify the contract instead of flagging suspect_cpus_ignored."""
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    c = bench.core_contract(spark)
    assert c["cpus_env"] == "8"
    assert (
        c["default_parallelism"] == spark.sparkContext.defaultParallelism
    )
    monkeypatch.delenv("SPARK_GRAFT_CPUS")
    assert bench.core_contract(spark)["cpus_env"] is None


def test_needs_more_warmup_policy():
    """r10 verdict item 8: warm-up continues while run-over-run
    improvement exceeds 20%, needs two runs to compare, caps at
    WARMUP_MAX."""
    assert bench.needs_more_warmup([])  # always probe at least twice
    assert bench.needs_more_warmup([1.0])
    # improved 4.3 -> 0.8 (the measured r10 JIT cliff): keep warming
    assert bench.needs_more_warmup([4.3, 0.8])
    # flat (0.8 -> 0.79, < 20% better): stop
    assert not bench.needs_more_warmup([4.3, 0.8, 0.79])
    # got slower: stop
    assert not bench.needs_more_warmup([0.5, 0.6])
    # cap regardless of trend
    assert not bench.needs_more_warmup([5.0, 2.0, 1.0, 0.5, 0.2])


def test_latest_prev_bench_sorts_numerically(tmp_path):
    """r100 must beat r99 — lexicographic sort would pick r99 forever
    once the round number outgrows the padded width."""
    for n in (7, 99, 100):
        (tmp_path / f"BENCH_r{n}.json").write_text("{}")
    (tmp_path / "BENCH_rX.json").write_text("{}")  # unparsable: ignored
    assert bench._latest_prev_bench(tmp_path) == "BENCH_r100.json"
