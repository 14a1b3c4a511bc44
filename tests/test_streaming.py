"""Structured Streaming parity: the streaming tumbling aggregation must
produce exactly the batch result (one plan, two execution modes)."""

from __future__ import annotations

import os

from iceberg_trino_sql_demo_spark import operators as ops
from iceberg_trino_sql_demo_spark.streaming.ingest import stream_tumbling_counts

ops.load_all()

SF = "/root/testdata/sf0.001"


def _key(rows):
    return sorted(
        (r.window_start.isoformat(), r.event_type, r.n_events, r.total_value) for r in rows
    )


def test_stream_equals_batch(spark):
    batch = ops.QUERIES["events_tumbling_hourly"](spark, SF).collect()
    stream = stream_tumbling_counts(spark, SF, "t_stream_parity").collect()
    assert _key(stream) == _key(batch)
    assert len(batch) > 0


def test_stateful_operator_equals_batch(spark):
    """applyInPandasWithState running totals must equal the batch groupBy."""
    out = {r.user_id: (r.n_events, r.total_value, r.last_event_id)
           for r in ops.QUERIES["events_stateful_user_totals"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from pyspark.sql import functions as F

    batch = {r.user_id: (r.n, round(r.tv, 2), r.last) for r in
             ev.groupBy("user_id").agg(
                 F.count(F.lit(1)).alias("n"),
                 (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("tv"),
                 F.max("event_id").alias("last"),
             ).collect()}
    assert {k: (v[0], round(v[1], 2), v[2]) for k, v in out.items()} == batch


def test_stream_ingestion_into_engine_table(spark, tmp_path):
    """foreachBatch -> Table.insert: every micro-batch is an atomic snapshot;
    the drained table holds exactly the source rows."""
    from iceberg_trino_sql_demo_spark.sources.table import Table
    from iceberg_trino_sql_demo_spark.streaming.ingest import stream_into_table

    t = Table.create(
        spark, str(tmp_path / "events_ice"),
        [("event_id", "bigint"), ("ts", "bigint"), ("user_id", "bigint"),
         ("event_type", "string"), ("value", "double"), ("props", "string")],
        partitioning=["event_type"],
    )
    stream_into_table(spark, SF, t)
    src_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert t.df().count() == src_n
    ops_seq = [s.operation for s in t.meta.snapshots]
    assert ops_seq and all(o == "append" for o in ops_seq)
    # streaming appends are CDC-able like any other write
    changes = t.table_changes(t.meta.snapshots[0].snapshot_id,
                              t.meta.refs["main"]) if len(t.meta.snapshots) > 1 else None
    assert changes is None or changes.count() >= 0


def test_stream_ingestion_exactly_once(spark, tmp_path):
    """The sink's (stream_id, batch_id) watermark rides the snapshot
    summary, so re-delivered batches and checkpoint restarts never
    double-append, while a genuinely new batch id still commits."""
    from iceberg_trino_sql_demo_spark.sources.table import Table
    from iceberg_trino_sql_demo_spark.streaming.ingest import (
        STREAM_BATCH_KEY,
        STREAM_ID_KEY,
        stream_into_table,
        table_sink,
    )

    t = Table.create(
        spark, str(tmp_path / "events_eo"),
        [("event_id", "bigint"), ("ts", "bigint"), ("user_id", "bigint"),
         ("event_type", "string"), ("value", "double"), ("props", "string")],
    )
    ckpt = str(tmp_path / "ckpt_eo")
    stream_into_table(spark, SF, t, checkpoint_dir=ckpt)
    src_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert t.df().count() == src_n
    tagged = [s for s in t.meta.snapshots if STREAM_ID_KEY in s.summary]
    assert tagged, "streaming snapshots must carry the watermark summary"
    max_batch = max(int(s.summary[STREAM_BATCH_KEY]) for s in tagged)

    # restart from the same checkpoint with no new source files: no-op
    n_snaps = len(t.meta.snapshots)
    stream_into_table(spark, SF, t, checkpoint_dir=ckpt)
    assert t.df().count() == src_n
    assert len(t.meta.snapshots) == n_snaps

    # simulate foreachBatch re-delivery of an already-committed batch id
    stream_id = os.path.basename(ckpt)
    sink = table_sink(t, stream_id)
    replay = t.df().limit(5)
    sink(replay, max_batch)          # duplicate delivery -> dropped
    assert t.df().count() == src_n
    sink(replay.select(*[f.name for f in t.meta.schema.fields]), max_batch + 1)
    assert t.df().count() == src_n + 5   # new batch id -> committed
    # a second stream (different checkpoint) tracks its own watermark:
    # its batch 0 is NOT swallowed by this stream's high-water mark
    other = table_sink(t, "other-stream")
    other(replay.select(*[f.name for f in t.meta.schema.fields]), 0)
    assert t.df().count() == src_n + 10


def test_ice_changes_stream_reader_offsets_and_guard(spark, tmp_path, sf_dir):
    """Direct contract test of the CDC stream reader: offset walk, exact
    range replay (readBetweenOffsets — checkpoint recovery), and the loud
    append-only guard on delete-bearing histories."""
    import pytest

    from iceberg_trino_sql_demo_spark.sources.catalog import Catalog
    from iceberg_trino_sql_demo_spark.sources.pyds import IceChangesStreamReader

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_schema("cdc")
    cat.use("cdc")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    t = cat.ctas("nation", nation)
    s0 = t._resolve().snapshot_id
    t.insert([{"n_nationkey": 9900, "n_name": "B1", "n_regionkey": 0}])
    s1 = t._resolve().snapshot_id
    t.insert([{"n_nationkey": 9901, "n_name": "B2", "n_regionkey": 0}])
    s2 = t._resolve().snapshot_id

    r = IceChangesStreamReader(t.location, s0)
    assert r.initialOffset() == {"snapshot_id": s0}
    rows, nxt = r.read({"snapshot_id": s0})
    assert nxt == {"snapshot_id": s2}
    assert [x[1] for x in rows] == ["B1", "B2"]  # commit order
    assert {x[-2] for x in rows} == {"insert"}
    # empty batch at head (an iterator — pyspark probes it with next())
    rows2, nxt2 = r.read(nxt)
    assert list(rows2) == [] and nxt2 == nxt
    # exact range replay: only the first append
    replay = r.readBetweenOffsets({"snapshot_id": s0}, {"snapshot_id": s1})
    assert [x[1] for x in replay] == ["B1"]
    # bounded mode (ADVICE r5): max_files_per_batch caps how much backlog
    # one read() materializes — two 1-file appends drain in two batches,
    # and the union equals the unbounded drain
    rb = IceChangesStreamReader(t.location, s0, max_files_per_batch=1)
    rows_a, off_a = rb.read({"snapshot_id": s0})
    assert off_a == {"snapshot_id": s1} and [x[1] for x in rows_a] == ["B1"]
    rows_b, off_b = rb.read(off_a)
    assert off_b == {"snapshot_id": s2} and [x[1] for x in rows_b] == ["B2"]

    # append-only guard: a MoR delete makes the next batch raise loudly
    t.delete("n_nationkey = 9900")
    with pytest.raises(ValueError, match="append-only"):
        r.read({"snapshot_id": s2})


def test_stream_cdc_full_exactly_once_restart(spark, tmp_path, sf_dir):
    """Full-CDC replica (mode='cdc', by-key apply): a history with UPDATE
    (blind upsert), DELETE (MoR) and appends converges the replica to the
    source head; restarting the SAME checkpoint re-delivers nothing new
    (batch watermark lives in the replica's snapshot summary) and the
    snapshot count proves it."""
    from iceberg_trino_sql_demo_spark.sources.catalog import Catalog
    from iceberg_trino_sql_demo_spark.streaming.ingest import (
        stream_cdc_to_replica_by_key,
    )

    cat = Catalog(spark, str(tmp_path / "wh_cdcfull"))
    cat.create_schema("cf")
    cat.use("cf")
    rows = [{"k": i, "v": f"v{i}"} for i in range(8)]
    src = cat.ctas("src", spark.createDataFrame(rows))
    rep = src.clone(str(tmp_path / "rep"))
    s0 = src._resolve().snapshot_id
    src.upsert_by_key(spark.createDataFrame([{"k": 2, "v": "N2"}]), ["k"])
    src.delete("k = 5")
    src.insert([{"k": 60, "v": "v60"}])

    ckpt = str(tmp_path / "ckpt_cdc")
    stream_cdc_to_replica_by_key(
        spark, src, rep, ["k"], checkpoint_dir=ckpt, start_snapshot_id=s0
    )
    exp = {(r.k, r.v) for r in src.refresh().df().collect()}
    assert {(r.k, r.v) for r in rep.refresh().df().collect()} == exp
    n_snaps = len(rep.meta.snapshots)

    # restart on the same checkpoint: no new source commits -> no new
    # replica snapshots, state unchanged
    stream_cdc_to_replica_by_key(
        spark, src, rep.refresh(), ["k"], checkpoint_dir=ckpt,
        start_snapshot_id=s0,
    )
    rep.refresh()
    assert len(rep.meta.snapshots) == n_snaps
    assert {(r.k, r.v) for r in rep.df().collect()} == exp


def test_cdc_sink_bounds_delete_files_over_many_batches(spark, tmp_path):
    """A long-running cdc_upsert_sink must not accumulate delete files
    forever: past the delete_rewrite_threshold the sink folds equality
    deletes to position form and consolidates those into one deletion
    vector, all between batches, all data-invariant.  30 upsert batches
    with threshold 5: the live delete-file count stays bounded the whole
    run and the final state matches the per-key last-write model."""
    from iceberg_trino_sql_demo_spark.sources.catalog import Catalog
    from iceberg_trino_sql_demo_spark.streaming.ingest import cdc_upsert_sink

    cat = Catalog(spark, str(tmp_path / "wh_bound"))
    cat.create_schema("bd")
    cat.use("bd")
    rep = cat.ctas(
        "rep",
        spark.createDataFrame([{"k": i, "v": "init"} for i in range(20)]),
        properties={"delete_rewrite_threshold": "5"},
    )
    sink = cdc_upsert_sink(rep, ["k"], "s_bound")
    model = {i: "init" for i in range(20)}
    max_del_files = 0
    for b in range(30):
        k_up, k_del = b % 20, (b + 7) % 20
        batch = spark.createDataFrame(
            [(k_up, f"v{b}", "insert", b + 1), (k_del, None, "delete", b + 1)],
            "k long, v string, _change_type string, _commit_sequence_number long",
        )
        sink(batch, b)
        model[k_up] = f"v{b}"
        model.pop(k_del, None)
        rep.refresh()
        n_del = len(rep.io.read_manifest(rep._resolve()).delete_files)
        max_del_files = max(max_del_files, n_del)
    # threshold 5 + at most a couple of in-flight files between rewrites
    assert max_del_files <= 7, max_del_files
    got = {r.k: r.v for r in rep.df().collect()}
    assert got == model
    # re-delivery after maintenance commits is still a no-op (the
    # watermark summary survives the rewrites)
    n = rep.df().count()
    sink(batch, 29)
    rep.refresh()
    assert rep.df().count() == n
