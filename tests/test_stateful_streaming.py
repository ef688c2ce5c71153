"""applyInPandasWithState: per-user running totals must accumulate
ACROSS micro-batches (state store persistence), and the final totals
must equal the batch recompute."""

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_state_persists_across_microbatches(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import load_events
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        read_event_stream,
        stateful_user_totals,
    )

    ev = load_events(spark, SF_ORACLE).filter(F.col("user_id") < 20).limit(400).cache()
    # two separate file drops → two micro-batches (maxFilesPerTrigger=1)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    path = str(tmp_path / "drops")
    first.coalesce(1).write.mode("overwrite").parquet(path)
    import glob
    import shutil

    # write the second drop as an additional file in the same dir
    tmp2 = str(tmp_path / "drop2")
    second.coalesce(1).write.mode("overwrite").parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")

    stream = read_event_stream(spark, path, max_files=1)
    out = stateful_user_totals(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM user_totals").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    # at least one user appears in both micro-batches with growing totals
    multi = {u: rs for u, rs in per_user.items() if len(rs) >= 2}
    assert multi, "expected users spanning micro-batches"
    for u, rs in multi.items():
        rs.sort(key=lambda r: r["total_events"])
        assert rs[-1]["total_events"] == sum(r["batch_events"] for r in rs)

    # final totals equal batch recompute
    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    for u, rs in per_user.items():
        last = max(rs, key=lambda r: r["total_events"])
        n, s = batch[u]
        assert last["total_events"] == n
        assert abs(last["total_value"] - s) < 1e-6
