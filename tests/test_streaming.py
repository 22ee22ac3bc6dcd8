"""Structured Streaming: batch/stream window equivalence, the geo
stream filter (T4 — the reference's missing GeoFilterStream), and
JSON parse-or-drop (P9)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions.jsonfns import LOCAL_TIME_FORMAT
from vbb_data_pipeline_spark.queries import load_table
from vbb_data_pipeline_spark.streaming.arrivals import arrivals_as_wire, geo_filter_arrivals
from vbb_data_pipeline_spark.streaming.windows import run_to_memory, tumbling

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    """The same tumbling expression under readStream (file source,
    processAllAvailable) must produce the batch answer — SURVEY.md §7
    hard-part 6's twin strategy, verified end to end."""
    events = load_table(spark, SF, "events").select("ts", "event_type", "value")
    events.write.mode("overwrite").parquet(str(tmp_path / "ev"))

    batch = tumbling(
        spark.read.parquet(str(tmp_path / "ev")),
        "ts", "1 hour", ["event_type"],
        F.count(F.lit(1)).alias("n"),
    )
    stream_in = (
        spark.readStream.schema(events.schema).parquet(str(tmp_path / "ev"))
    )
    stream_agg = tumbling(
        stream_in, "ts", "1 hour", ["event_type"],
        F.count(F.lit(1)).alias("n"),
        watermark="1 minute",
    )
    run_to_memory(stream_agg, "tumble_out", output_mode="complete")
    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.sql("select * from tumble_out").collect()
    }
    exp = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert got == exp


def _wire(ts: str, name: str, lat, lon) -> str:
    d = {"name": name, "latitude": lat, "longitude": lon, "local-time": ts}
    return json.dumps(d)


def test_geo_filter_arrivals_batch(spark):
    rows = [
        (_wire("2024-01-01 08:00:00.0000000", "Alexanderplatz", 52.52437, 13.41053),),
        (_wire("2024-01-01 08:05:00.0000000", "Potsdam Hbf", 52.39886, 13.06566),),
        ("{not json",),  # P9: malformed → dropped
        (_wire("2024-01-01 08:10:00.0000000", "NoCoords", None, None),),
    ]
    df = spark.createDataFrame(rows, "value string")
    # 25 km around Alexanderplatz: keeps only Alexanderplatz itself
    out = geo_filter_arrivals(df, 52.52437, 13.41053, 25_000).collect()
    assert len(out) == 1
    payload = json.loads(out[0].value)
    assert payload["name"] == "Alexanderplatz"
    assert set(payload) == {"name", "latitude", "longitude", "local-time"}


def test_geo_filter_arrivals_streaming(spark, tmp_path):
    """T4 end-to-end under readStream — completes the reference's
    unfinished GeoFilterStream intent."""
    rows = [
        (_wire("2024-01-01 08:00:00.0000000", "Alexanderplatz", 52.52437, 13.41053),),
        (_wire("2024-01-01 08:05:00.0000000", "Potsdam Hbf", 52.39886, 13.06566),),
    ]
    spark.createDataFrame(rows, "value string").write.mode("overwrite").parquet(
        str(tmp_path / "wire")
    )
    stream = spark.readStream.schema("value string").parquet(str(tmp_path / "wire"))
    filtered = geo_filter_arrivals(stream, 52.52437, 13.41053, 25_000)
    run_to_memory(filtered, "geo_out")
    out = spark.sql("select * from geo_out").collect()
    assert len(out) == 1
    assert json.loads(out[0].value)["name"] == "Alexanderplatz"


def test_arrivals_wire_format(spark, gtfs, window_jan_feb):
    """P2: expansion output serializes to the exact reference wire keys
    with the 7-digit fractional-seconds format (GtfsArrival.java:33-36)."""
    import datetime as dt

    from vbb_data_pipeline_spark.operators.temporal import expand_arrivals

    start, end = window_jan_feb
    arr = expand_arrivals(
        gtfs["calendar"], gtfs["trips"], gtfs["stop_times"], gtfs["stops"], start, end
    )
    wire = arrivals_as_wire(arr).head()
    payload = json.loads(wire.value)
    assert set(payload) == {"name", "latitude", "longitude", "local-time"}
    # yyyy-MM-dd HH:mm:ss.SSSSSSS → 7 fractional digits
    frac = payload["local-time"].split(".")[-1]
    assert len(frac) == 7


# ---------------------------------------------------------------------------
# Stream-stream interval join (watermark-bounded state)
# ---------------------------------------------------------------------------
def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Purchases within 30 min after a click, per user: the streaming
    result (two file streams, availableNow to completion) must equal
    the batch twin of the same interval join."""
    import uuid

    from pyspark.sql import functions as F

    from vbb_data_pipeline_spark.queries import load_table
    from vbb_data_pipeline_spark.streaming.joins import interval_join
    from vbb_data_pipeline_spark.streaming.windows import run_to_memory

    sf = "/root/testdata/sf0.001"
    # Stage a normalized copy (load_table gives ts a proper
    # TimestampType regardless of the testdata's parquet encoding —
    # watermarks reject TIMESTAMP_NTZ event time).
    e = load_table(spark, sf, "events")
    staged = str(tmp_path / "events_stream")
    e.write.mode("overwrite").parquet(staged)

    def stream_side(etype, id_alias, ts_alias):
        raw = spark.readStream.schema(e.schema).parquet(staged)
        return (
            raw.filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(id_alias),
                "user_id",
                F.col("ts").alias(ts_alias),
            )
        )

    joined = interval_join(
        stream_side("click", "click_id", "click_ts"),
        stream_side("purchase", "purchase_id", "purchase_ts"),
        on=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower_seconds=0,
        upper_seconds=1800,
    ).select("__l.click_id", "__r.purchase_id")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    run_to_memory(joined, name, output_mode="append")
    got = {(r.click_id, r.purchase_id) for r in spark.table(name).collect()}

    e = load_table(spark, sf, "events")
    def batch_side(etype, id_alias, ts_alias):
        return e.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(id_alias),
            "user_id",
            F.col("ts").alias(ts_alias),
        )
    batch = interval_join(
        batch_side("click", "click_id", "click_ts"),
        batch_side("purchase", "purchase_id", "purchase_ts"),
        on=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower_seconds=0,
        upper_seconds=1800,
    ).select("__l.click_id", "__r.purchase_id")
    exp = {(r.click_id, r.purchase_id) for r in batch.collect()}
    assert got == exp
    assert len(exp) > 0


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 StatefulProcessor API)
# --------------------------------------------------------------------------
def test_tws_capability_gate(spark):
    """Without protobuf the wrapper must fail fast at plan build with
    a clear message — never crash executor workers mid-query."""
    import pytest

    from vbb_data_pipeline_spark.streaming.stateful import (
        running_counts_tws,
        tws_available,
    )

    events = load_table(spark, SF, "events").select("ts", "user_id")
    if tws_available():
        pytest.skip("protobuf present; gate not exercised")
    with pytest.raises(RuntimeError, match="protobuf"):
        running_counts_tws(events)


def test_tws_running_counts_equals_batch(spark, tmp_path):
    """StatefulProcessor running counters == batch aggregate (same
    guarantee the applyInPandasWithState twin is oracle-checked for).
    Runs only where Spark's streaming Python runner can start."""
    import pytest

    from vbb_data_pipeline_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        running_counts_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("protobuf not installed; transformWithState runner "
                    "cannot start in this environment")
    import uuid

    events = load_table(spark, SF, "events").select("ts", "user_id")
    events.write.mode("overwrite").parquet(str(tmp_path / "ev"))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "ev"))
        out = running_counts_tws(stream)
        name = f"tws_{uuid.uuid4().hex[:8]}"
        run_to_memory(out, name, output_mode="update")
        got = {
            (r.user_id, r.n_events, r.last_ts)
            for r in spark.table(name).collect()
        }
        exp = {
            (r.user_id, r.n_events, r.last_ts)
            for r in events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.max("ts").alias("last_ts"),
            )
            .collect()
        }
        assert got == exp
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
