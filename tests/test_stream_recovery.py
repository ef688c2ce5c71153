"""Checkpoint kill/recover for the stateful streaming jobs (VERDICT
r10 #5): the at-least-once redelivery tests prove dup tolerance, these
prove RESTART-FROM-CHECKPOINT — a query dies (or is stopped) between
micro-batches, a new query starts from the same checkpoint dir, and
final state + sink rows equal the uninterrupted run.

Mechanics under test:
- the file source WAL pins each micro-batch's file set before
  execution, so a retried batch re-reads the same files;
- the state store commits per batch, so a batch that failed mid-run
  leaves no partial state and its retry starts from the last committed
  version;
- foreachBatch epochs resume from the first uncommitted epoch.

The kill is a deterministic bomb: foreachBatch raises on a chosen epoch
BEFORE recording any output, so the failed attempt contaminates
nothing and the retry after restart is the first time that batch's
rows are seen.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException


def _write_drops(spark, base, schema, drops):
    """One parquet file per drop, mtimes spaced so the file source's
    (modTime, path) ordering is deterministic."""
    import glob
    import shutil

    path = str(base)
    os.makedirs(path, exist_ok=True)
    t0 = 1_600_000_000
    for i, rows in enumerate(drops):
        tmp = f"{path}__tmp{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        for j, f in enumerate(sorted(glob.glob(f"{tmp}/part-*.parquet"))):
            dst = f"{path}/drop{i:02d}-{j}.parquet"
            shutil.copy(f, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))
        shutil.rmtree(tmp)
    return path


class _Recorder:
    """foreachBatch sink capturing committed rows per epoch, with an
    armable bomb that raises before recording on the chosen epoch."""

    def __init__(self, bomb_epoch=None):
        self.rows: dict[int, list] = {}
        self.bomb_epoch = bomb_epoch
        self.armed = bomb_epoch is not None

    def __call__(self, batch_df, epoch):
        if self.armed and epoch == self.bomb_epoch:
            self.armed = False
            raise RuntimeError(f"bomb: killing epoch {epoch}")
        self.rows[epoch] = [tuple(r) for r in batch_df.collect()]

    def all_rows(self):
        return [r for ep in sorted(self.rows) for r in self.rows[ep]]


DOCS_SCHEMA = "doc_id long, text string"
# keeper ids are the per-content minima AND arrive in earlier drops, so
# the expected mapping is slicing-independent
DOC_DROPS = [
    [(0, "alpha"), (1, "beta")],
    [(2, "alpha"), (3, "gamma")],
    [(4, "beta"), (5, "delta")],          # <- killed + retried batch
    [(6, "gamma"), (7, "alpha"), (8, "delta"), (9, "epsilon")],
]
EXPECTED_KEEPERS = {0, 1, 3, 5, 9}
EXPECTED_DUP_OF = {2: 0, 7: 0, 4: 1, 6: 3, 8: 5}


def _dedup_stream(spark, path):
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        streaming_exact_dedup,
    )

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return streaming_exact_dedup(stream)


def _run_available(out, ckpt, recorder):
    q = (
        out.writeStream.foreachBatch(recorder)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_exact_dedup_kill_recover_equals_uninterrupted(spark, tmp_path):
    path = _write_drops(spark, tmp_path / "docs", DOCS_SCHEMA, DOC_DROPS)

    # killed run: epoch 2 bombs after epochs 0-1 committed
    rec = _Recorder(bomb_epoch=2)
    with pytest.raises(StreamingQueryException):
        _run_available(_dedup_stream(spark, path), str(tmp_path / "ck"), rec)
    assert sorted(rec.rows) == [0, 1]  # two committed, bomb recorded nothing

    # restart from the SAME checkpoint: resumes at epoch 2
    _run_available(_dedup_stream(spark, path), str(tmp_path / "ck"), rec)
    recovered = sorted(rec.all_rows())
    assert sorted(rec.rows) == [0, 1, 2, 3]

    # uninterrupted reference: fresh checkpoint, fresh recorder
    ref = _Recorder()
    _run_available(_dedup_stream(spark, path), str(tmp_path / "ck_ref"), ref)
    assert recovered == sorted(ref.all_rows())

    # and the recovered output is semantically right: keepers chosen in
    # pre-kill batches survive the restart (state store recovery), dups
    # across the kill point still point at them
    got = {r[0]: r for r in recovered}
    assert len(got) == 10
    assert {i for i, r in got.items() if r[2]} == EXPECTED_KEEPERS
    assert {i: r[3] for i, r in got.items() if not r[2]} == EXPECTED_DUP_OF


EVENTS_SCHEMA = "event_id long, user_id long, event_type string, ts long"
# user 1's funnel STRADDLES the kill: v,c committed pre-kill, the p that
# completes the match is in the bombed batch — recovery must restore
# dfa=2 or the match is lost. user 2's funnel spans all three batches.
EVENT_DROPS = [
    [(1, 1, "view", 10), (2, 1, "click", 20), (3, 2, "view", 30)],
    [(4, 1, "purchase", 40), (5, 1, "view", 50), (6, 2, "click", 60)],  # bomb
    [(7, 1, "click", 70), (8, 1, "purchase", 80), (9, 2, "purchase", 90)],
]
EXPECTED_FUNNEL = {1: 2, 2: 1}


def _funnel_stream(spark, path):
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        streaming_funnel_counts,
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return streaming_funnel_counts(stream)


def test_funnel_kill_recover_preserves_dfa_and_counts(spark, tmp_path):
    path = _write_drops(spark, tmp_path / "ev", EVENTS_SCHEMA, EVENT_DROPS)

    rec = _Recorder(bomb_epoch=1)
    with pytest.raises(StreamingQueryException):
        _run_available(_funnel_stream(spark, path), str(tmp_path / "ck"), rec)
    _run_available(_funnel_stream(spark, path), str(tmp_path / "ck"), rec)

    # final running count per user == uninterrupted run == hand-traced
    def final_counts(rows):
        out = {}
        for user, _batch_matches, n_strict in rows:
            out[user] = max(out.get(user, 0), n_strict)
        return out

    recovered = final_counts(rec.all_rows())
    ref = _Recorder()
    _run_available(_funnel_stream(spark, path), str(tmp_path / "ck_ref"), ref)
    assert recovered == final_counts(ref.all_rows()) == EXPECTED_FUNNEL
    # match totals agree too (sum of per-batch deltas == final count)
    assert sum(bm for _, bm, _ in rec.all_rows()) == sum(EXPECTED_FUNNEL.values())


def test_dedup_ingest_sink_restart_does_not_reingest(spark, tmp_path):
    """The dedup-on-ingest workspace sink: stop after drop 1, add drop
    2, restart from the same checkpoint. The source offsets must
    recover (drop 1 NOT re-processed — a re-ingest would quarantine
    every drop-1 row as a near-dup of itself), drop 2's cross-drop dup
    must quarantine against the drop-1 corpus, and the final workspace
    must equal an uninterrupted ingest of both drops."""
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        stream_dedup_upsert_to_workspace,
    )
    from tests.test_workspace_streaming_multimodal import _chunks_df

    text_a = "the quick brown fox jumps over a lazy dog by the river bank"
    text_b = "training data pipelines need dedup before minhash at scale"
    text_c = "a wholly different document about query engines and joins"

    def chunks(ids_texts, spark):
        df = _chunks_df(spark, n=len(ids_texts))
        ids = list(ids_texts)
        mapping = F.create_map(
            *[x for i, t in ids_texts.items() for x in (F.lit(i), F.lit(t))]
        )
        df = df.withColumn(
            "id",
            F.element_at(
                F.array(*[F.lit(i) for i in ids]),
                (F.col("id") + 1).cast("int"),
            ),
        )
        return df.withColumn("text", mapping[F.col("id")]).withColumn(
            "doc_id", F.col("id").cast("string")
        )

    drop1 = chunks({10: text_a, 11: text_b}, spark)
    drop2 = chunks({20: text_a, 21: text_c}, spark)  # 20 dups corpus row 10

    def ingest(ws_dir, ck_dir, phased):
        ws = Workspace(spark, str(tmp_path / ws_dir))
        src = str(tmp_path / f"{ws_dir}_in")
        os.makedirs(src, exist_ok=True)
        drops = [drop1, drop2]
        phases = [[0], [1]] if phased else [[0, 1]]
        for phase in phases:
            for d in phase:
                drops[d].coalesce(1).write.mode("append").parquet(src)
            stream = (
                spark.readStream.format("parquet")
                .schema(drop1.schema)
                .load(src)
            )
            q = stream_dedup_upsert_to_workspace(
                stream, ws, str(tmp_path / ck_dir), threshold=0.6
            )
            q.processAllAvailable()
            q.stop()
        return ws

    ws_p = ingest("ws_phased", "ck_phased", phased=True)
    ws_u = ingest("ws_uninterrupted", "ck_u", phased=False)

    def snapshot(ws):
        kept = sorted(
            tuple(r)
            for r in ws.chunks(fold_boosts=False).select("id", "text").collect()
        )
        quar = sorted(
            tuple(r)
            for r in spark.read.parquet(ws._tbl("dup_quarantine"))
            .select("id", "dup_of")
            .collect()
        )
        return kept, quar

    kept_p, quar_p = snapshot(ws_p)
    kept_u, quar_u = snapshot(ws_u)
    assert kept_p == kept_u
    assert quar_p == quar_u == [(20, 10)]
    assert {k for k, _ in kept_p} == {10, 11, 21}
