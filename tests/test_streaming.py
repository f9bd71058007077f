"""Streaming pipeline tests: file-source micro-batch ETL with
dedup-within-watermark, plus windowed/session aggregations via the
rate-free availableNow trigger."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_developstoday_test_spark.config import EtlSettings
from etl_developstoday_test_spark.streaming.pipeline import (
    run_stream,
    stream_sessionized,
    stream_tumbling_hourly,
)

CSV_HEADER = (
    "tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,trip_distance,"
    "store_and_fwd_flag,PULocationID,DOLocationID,fare_amount,tip_amount\n"
)


def test_stream_etl_dedups_and_writes(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "batch1.csv").write_text(
        CSV_HEADER
        + "01/01/2020 10:00:00 AM,01/01/2020 10:10:00 AM,1,1.0,N,1,2,10,1\n"
        + "01/01/2020 10:00:00 AM,01/01/2020 10:10:00 AM,1,9.9,Y,9,9,99,9\n"  # dup key
        + "01/01/2020 11:00:00 AM,01/01/2020 11:05:00 AM,2,2.0,N,3,4,20,2\n"
        + "bad-ts,01/01/2020 11:05:00 AM,2,2.0,N,3,4,20,2\n"  # invalid
    )
    settings = EtlSettings(
        input_path=str(landing),
        duplicates_path=str(tmp_path / "dups"),
        output_path=str(tmp_path / "out"),
    )
    q = run_stream(spark, settings, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {tuple(r) for r in out.select("PULocationID", "trip_distance").collect()}
    assert len(rows) == 2  # dup dropped, invalid dropped
    assert (1, __import__("decimal").Decimal("1.000")) in rows

    # second micro-batch: same keys arrive again within the watermark →
    # still deduped against state
    (landing / "batch2.csv").write_text(
        CSV_HEADER
        + "01/01/2020 10:00:00 AM,01/01/2020 10:10:00 AM,1,5.5,N,7,7,7,7\n"
        + "01/01/2020 11:30:00 AM,01/01/2020 11:35:00 AM,3,3.0,N,5,6,30,3\n"
    )
    q2 = run_stream(spark, settings, checkpoint_dir=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    out2 = spark.read.parquet(str(tmp_path / "out"))
    assert out2.count() == 3  # only the new key landed

    # per-batch clean-row counts side-output, keyed by batch id
    counts = {
        r["_batch_id"]: r["n_clean"]
        for r in spark.read.parquet(str(tmp_path / "dups" / "counts")).collect()
    }
    assert sum(counts.values()) == 3
    assert all(n >= 0 for n in counts.values()) and len(counts) >= 2


def _events_stream(spark, tmp_path):
    src = tmp_path / "events_src"
    os.makedirs(src, exist_ok=True)
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "click", 1.0),
            (2, "2024-01-01 00:10:00", 1, "click", 2.0),
            (3, "2024-01-01 01:05:00", 1, "view", 4.0),
            (4, "2024-01-01 00:20:00", 2, "view", 8.0),
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(src))
    return spark.readStream.schema(df.schema).parquet(str(src))


def test_stream_tumbling_hourly(spark, tmp_path):
    agg = stream_tumbling_hourly(_events_stream(spark, tmp_path))
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 4.0)
    assert got[("2024-01-01 00:00:00", "view")] == (1, 8.0)


def test_stream_sessionized(spark, tmp_path):
    agg = stream_sessionized(_events_stream(spark, tmp_path))
    q = (
        agg.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM session_test").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: events at 00:00 and 00:10 merge (gap 10m < 30m); 01:05 is a
    # separate session
    assert len(by_user[1]) == 2
    assert {r["n_events"] for r in by_user[1]} == {2, 1}
    assert len(by_user[2]) == 1


def test_stream_user_running_totals_carries_state(spark, tmp_path):
    """State must persist across micro-batches: totals after batch 2
    include batch 1's events for the same user."""
    from etl_developstoday_test_spark.streaming.pipeline import (
        stream_user_running_totals,
    )

    src = tmp_path / "ev_src"
    ckpt = str(tmp_path / "ckpt_state")
    schema = "event_id long, ts string, user_id long, event_type string, value double"

    def write_batch(rows, name):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        df.coalesce(1).write.mode("append").parquet(str(src))

    def run_once(qname):
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        ).parquet(str(src))
        got = {}

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                got[r["user_id"]] = (r["n_events"], r["total_value"])

        q = (
            stream_user_running_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return got

    write_batch([(1, "2024-01-01 00:00:00", 1, "click", 1.5),
                 (2, "2024-01-01 00:01:00", 1, "view", 2.0),
                 (3, "2024-01-01 00:02:00", 2, "click", 4.0)], "b1")
    got1 = run_once("user_totals_b1")
    assert got1[1] == (2, 3.5) and got1[2] == (1, 4.0)

    write_batch([(4, "2024-01-01 01:00:00", 1, "click", 10.0)], "b2")
    got2 = run_once("user_totals_b2")
    assert got2[1] == (3, 13.5)  # state carried: 3.5 + 10.0, count 2+1


# --- physical-timestamp-type robustness (events.ts drifted NANOS→NTZ
# between testdata generations; pin that every encoding keeps working) --


def _write_events_parquet(path, unit):
    """Write a small events.parquet with ts encoded as timestamp[unit]
    WITHOUT a timezone (parquet isAdjustedToUTC=0 → Spark TIMESTAMP_NTZ
    for 'us'; TIMESTAMP(NANOS) for 'ns')."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # two users, one event every 30 min for 6 hours
    for i in range(12):
        t = base + dt.timedelta(minutes=30 * i)
        rows.append((i * 2, t, 1, "click", 1.0))
        rows.append((i * 2 + 1, t, 2, "view", 2.0))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, path, version="2.6")


def _hourly_counts(df):
    return {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in df.collect()
    }


def test_events_stream_adapts_to_ntz_and_nanos(spark, tmp_path):
    """events_stream must normalize ts to TimestampType from both the
    old (nanos) and new (NTZ micros) physical encodings and produce
    identical windowed aggregates."""
    from etl_developstoday_test_spark.sources.tables import (
        events_stream,
        load_table,
    )

    results = {}
    for unit in ("us", "ns"):
        d = tmp_path / f"sf_{unit}"
        d.mkdir()
        _write_events_parquet(str(d / "events.parquet"), unit)

        batch = load_table(spark, str(d), "events")
        assert str(batch.schema["ts"].dataType) == "TimestampType()"

        stream = (
            events_stream(spark, str(d))
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
            .select(F.col("win.start").alias("window_start"), "event_type",
                    "n_events", "total_value")
        )
        name = f"ntz_robust_{unit}"
        q = (
            stream.writeStream.format("memory").queryName(name)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        q.stop()
        results[unit] = _hourly_counts(spark.table(name))

    # 6 hourly windows x 2 event types, identical across encodings
    assert len(results["us"]) == 12
    assert results["us"] == results["ns"]
    assert results["us"][("2024-01-01 00:00:00", "click")] == (2, 2.0)


def test_stream_watermark_close_out_ntz_direct(spark, tmp_path):
    """stream_watermark_close_out previously survived the NTZ testdata
    change only because it round-trips events through its own parquet
    write; pin that it stays correct when fed NTZ input directly."""
    from etl_developstoday_test_spark.plans.queries import QUERIES

    _write_events_parquet(str(tmp_path / "events.parquet"), "us")
    got = {
        str(r["window_start"]): (r["n_events"], r["total_value"])
        for r in QUERIES["stream_watermark_close_out"](spark, str(tmp_path)).collect()
    }
    # max ts = 05:30 → watermark 03:30 → append-mode emits only windows
    # whose END <= 03:30: hours 00, 01, 02. Each hour holds 2x30min x
    # 2 users = 4 events totaling 2*(1.0+2.0) = 6.0.
    assert got == {
        "2024-01-01 00:00:00": (4, 6.0),
        "2024-01-01 01:00:00": (4, 6.0),
        "2024-01-01 02:00:00": (4, 6.0),
    }


def test_stream_stream_join_uses_symmetric_hash_state(spark):
    """The conversion query must execute as a genuine stateful
    stream-stream join: the progress metrics expose a state operator
    (symmetric hash join state on both sides), proving the time-bounded
    join didn't silently fall back to any batch shape."""
    import uuid

    from etl_developstoday_test_spark.sources.tables import events_stream

    sf_dir = "/root/testdata/sf0.001"
    views = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    name = f"ssj_state_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    q.stop()
    ops = progress["stateOperators"]
    assert ops, "no state operator: join did not run stateful"
    assert any(
        o.get("operatorName") == "symmetricHashJoin" for o in ops
    ), ops
    assert spark.table(name).count() > 0


def test_foreach_batch_idempotent_upsert_sink(spark, tmp_path):
    """The production exactly-once-sink pattern: foreachBatch merges
    each micro-batch into a keyed table with last-writer-wins, writing
    a new immutable version per merge (no read-modify-overwrite of the
    dir being read). Because the merge is a deterministic function of
    (state ∪ batch), REPLAYING a batch — the restart-after-sink-
    before-checkpoint-commit case at-least-once delivery produces —
    must leave the table byte-identical: idempotence is what upgrades
    at-least-once to effectively-exactly-once."""
    src = tmp_path / "upsert_src"
    state = {"v": 0}

    def target(v):
        return str(tmp_path / f"state_v{v}")

    def merge(batch_df, batch_id):
        from pyspark.sql import Window

        cur = (
            spark.read.parquet(target(state["v"]))
            if state["v"] > 0
            else batch_df.limit(0)
        )
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        merged = (
            cur.unionByName(batch_df)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            target(state["v"] + 1)
        )
        state["v"] += 1

    schema = "event_id long, ts timestamp, user_id long, value double"

    def snapshot():
        return sorted(
            tuple(r)
            for r in spark.read.parquet(target(state["v"])).select(
                "user_id", "event_id", "value"
            ).collect()
        )

    def run_stream_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", str(tmp_path / "ckpt_upsert"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    def write_batch(rows):
        spark.createDataFrame(
            [(e, ts, u, v) for e, ts, u, v in rows],
            "event_id long, ts string, user_id long, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    batch1 = [
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (2, "2024-01-01 00:05:00", 1, 11.0),  # later write wins for user 1
        (3, "2024-01-01 00:00:00", 2, 20.0),
    ]
    write_batch(batch1)
    run_stream_once()
    want1 = [(1, 2, 11.0), (2, 3, 20.0)]
    assert snapshot() == want1

    # replay the SAME batch through the merge (simulated redelivery):
    # a new version is written, but its contents must be unchanged
    replay = spark.createDataFrame(
        [(e, ts, u, v) for e, ts, u, v in batch1],
        "event_id long, ts string, user_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    merge(replay, batch_id=0)
    assert snapshot() == want1

    # a genuinely new batch: user 1 updated again, user 3 appears
    write_batch(
        [
            (4, "2024-01-01 01:00:00", 1, 12.0),
            (5, "2024-01-01 00:30:00", 3, 30.0),
        ]
    )
    run_stream_once()
    assert snapshot() == [(1, 4, 12.0), (2, 3, 20.0), (3, 5, 30.0)]
