"""S1-S9 — sinks/DML + the workspace abstraction (SURVEY §2.2).

Reference: one SQLite file per workspace under AppData
(`mainwindow.cpp:936-952`); INSERTs with paired FTS writes
(`vector_store.cpp:153-204`), UPDATE boosts (`:789-795`), log appends
(`:581-608`), KV metadata (`:764-787`), CSV/NumPy exports (`:657-671`,
`export_for_training.py`).

Spark-first: a workspace is a directory of Parquet tables. The FTS index
is DERIVED (rebuilt from chunks), never dual-written — eliminating the
reference's index/row consistency risk. Boost updates are APPEND-ONLY:
each +delta lands in a tiny `boosts` table and `chunks()` folds
`boost_factor + sum(deltas)` in at read time via a broadcast join, so a
single click never rewrites the corpus (the reference's UPDATE,
`vector_store.cpp:789-795`, touches one row; a full-table rewrite at
100 TB would not). `compact_boosts()` folds them into only the buckets
that hold boosted chunks. Row-level DML is bucket-scoped too:
`merge_chunks` (upsert) and `delete_doc` rewrite only the `_bucket=k`
directories the touched doc_ids hash to — Delta-style MERGE INTO /
DELETE semantics on plain Parquet. On a Delta/Iceberg deployment they
become real MERGE INTO/DELETE with no API change.

Durability scope: plain paths use os/shutil directly (the local fast
path); paths with a URI scheme (`file://`, `hdfs://`, `s3a://`, ...) go
through the Hadoop FileSystem API (`Path.getFileSystem`), so a workspace
can live on HDFS or an object store with no API change. Two commit
protocols (see `Workspace`): the default rename-based versioned swap
(local fast path — but rename of live directories is a server-side copy
on S3-like stores), and `commit_protocol="manifest"` — immutable
segment directories + an atomically-PUT per-table pointer file, live
data never renamed — the object-store-safe deployment shape. Both are
single-writer; true multi-writer needs the Delta path above.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators.keyword import build_fts_index

CHUNK_COLUMNS = [
    "id", "doc_id", "source_file", "page_num", "chunk_idx", "text",
    "embedding", "model_sig", "model_dim", "heading_path", "heading_level",
    "chunk_type", "sentence_count", "list_type", "list_length",
    "boost_factor", "created_at",
]

LOG_SCHEMA = (
    # rank slots are LONG: the reference reuses semantic_rank to carry
    # the clicked chunk rowid on USER_CLICK rows (vector_store.cpp:797),
    # and chunk ids here are 64-bit content hashes
    "query string, semantic_rank long, keyword_rank long, final_rank long, "
    "latency_embedding long, latency_search long, latency_fusion long, "
    "latency_rerank long, top_score double, mmr_penalty double, "
    "is_exploration int, rank_delta int, stability double, "
    # v15 column (`vector_store.cpp:144-148`, DEFAULT 1.0): carries the
    # adaptive-MMR relevance weight λ of the serving pass — 1.0 when MMR
    # was off (pure relevance, no diversity decay)
    "mmr_decay double, created_at timestamp"
)


class _LocalFS:
    """os/shutil directory ops — the local fast path (no JVM round
    trips on plain paths)."""

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def listdir(self, p: str) -> list[str]:
        return os.listdir(p) if os.path.isdir(p) else []

    def rmtree(self, p: str) -> None:
        import shutil

        shutil.rmtree(p, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def makedirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def has_parquet(self, p: str) -> bool:
        if not os.path.isdir(p):
            return False
        for _root, _dirs, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def dir_stamp(self, p: str, count_suffix: str = ".parquet") -> tuple[int, int, int]:
        """(files matching count_suffix, newest mtime ns, total bytes)
        across a directory's immediate files, (0, 0, 0) if none — ONE
        listing plus stats, no Spark job. All three stamp components
        come from the same listing so a concurrent writer can't produce
        a chimera stamp matching neither before nor after (ADVICE r9),
        and the HDFS flavor pays one listStatus RPC, not two."""
        n, best, total = 0, 0, 0
        for f in self.listdir(p):
            try:
                st = os.stat(os.path.join(p, f))
            except OSError:
                continue
            if f.endswith(count_suffix):
                n += 1
            best = max(best, st.st_mtime_ns)
            total += st.st_size
        return n, best, total

    def read_text(self, p: str) -> str | None:
        try:
            with open(p) as f:
                return f.read()
        except (FileNotFoundError, OSError):
            return None

    def write_text_atomic(self, p: str, s: str) -> None:
        """Single-file commit primitive: write a sibling temp file and
        os.replace() it over the target — atomic on POSIX."""
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(s)
        os.replace(tmp, p)

    def copytree(self, src: str, dst: str) -> None:
        """Zero-copy directory snapshot via hardlinks (parquet data
        files are immutable between DML versions — every mutation
        writes NEW files and renames directories, never rewrites bytes
        in place — so shared inodes are safe). Falls back to a real
        copy across devices."""
        import shutil

        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            out = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(out, exist_ok=True)
            for f in files:
                s, d = os.path.join(root, f), os.path.join(out, f)
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)


class _HadoopFS:
    """Hadoop FileSystem-backed ops for URI workspaces (file://, hdfs://,
    s3a://, ...): same contract as _LocalFS through `spark._jvm`'s
    `Path.getFileSystem`, so every Workspace code path (existence probe,
    versioned swap, vacuum, compaction) works unchanged against remote
    storage. NB on S3-like stores rename() is a server-side copy, not a
    metadata move — correct, but heavy-DML deployments belong on Delta."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def isdir(self, p: str) -> bool:
        P = self._Path(p)
        return bool(
            self._fs.exists(P) and self._fs.getFileStatus(P).isDirectory()
        )

    def listdir(self, p: str) -> list[str]:
        P = self._Path(p)
        if not self._fs.exists(P):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(P)]

    def rmtree(self, p: str) -> None:
        P = self._Path(p)
        if self._fs.exists(P):
            self._fs.delete(P, True)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise OSError(f"hadoop fs rename failed: {src} -> {dst}")

    def makedirs(self, p: str) -> None:
        self._fs.mkdirs(self._Path(p))

    def has_parquet(self, p: str) -> bool:
        if not self.isdir(p):
            return False
        it = self._fs.listFiles(self._Path(p), True)  # recursive
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                return True
        return False

    def dir_stamp(self, p: str, count_suffix: str = ".parquet") -> tuple[int, int, int]:
        """(files matching count_suffix, newest mtime ns, total bytes)
        across a directory's immediate files, (0, 0, 0) if none — one
        listStatus RPC, no Spark job. Hadoop reports millis; scaled to
        ns for parity with _LocalFS. The byte total matters because
        HDFS mtimes are millisecond-granular: a same-millisecond
        rewrite that preserves file count would otherwise reproduce an
        old stamp (ADVICE r8). All three components come from the SAME
        listing so a concurrent writer can't yield a chimera stamp, and
        the count no longer costs a second RPC (ADVICE r9)."""
        P = self._Path(p)
        if not self._fs.exists(P):
            return 0, 0, 0
        n, best, total = 0, 0, 0
        for s in self._fs.listStatus(P):
            if s.getPath().getName().endswith(count_suffix):
                n += 1
            best = max(best, int(s.getModificationTime()) * 1_000_000)
            total += int(s.getLen())
        return n, best, total

    def read_text(self, p: str) -> str | None:
        P = self._Path(p)
        if not self._fs.exists(P):
            return None
        stream = self._fs.open(P)
        try:
            # commons-io ships with Hadoop; one RPC for the whole file
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, p: str, s: str) -> None:
        """Single-file commit primitive. A full-object create/PUT is
        atomic on object stores (S3 PUT) and close-visible on HDFS —
        readers see either the old or the new manifest, never a torn
        one (manifests are < 1 KB: one filesystem block/part)."""
        stream = self._fs.create(self._Path(p), True)  # overwrite=True
        try:
            stream.write(bytearray(s.encode("utf-8")))  # py4j -> byte[]
        finally:
            stream.close()

    def copytree(self, src: str, dst: str) -> None:
        """Server-side copy through Hadoop FileUtil (no hardlinks on
        generic stores; still one RPC per file, no data through the
        driver)."""
        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._jvm
        conf = SparkSession.getActiveSession()._jsc.hadoopConfiguration()
        ok = jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs, self._Path(src), self._fs, self._Path(dst), False, conf
        )
        if not ok:
            raise OSError(f"hadoop fs copy failed: {src} -> {dst}")


def _logged(fn):
    """Append a row to the workspace's `_history` table after every
    successful mutation — the Delta DESCRIBE HISTORY analog (op name,
    wall timestamp, monotone version). Logging happens AFTER the
    mutation commits, so a crashed op leaves no phantom history row;
    single-writer contract matches the module's durability scope."""
    import functools

    @functools.wraps(fn)
    def wrap(self, *args, **kwargs):
        out = fn(self, *args, **kwargs)
        self._log_history(fn.__name__)
        return out

    return wrap


class Workspace:
    """Directory-backed workspace (reference: one SQLite file each).

    Commit protocols (`commit_protocol` ctor arg, persisted in metadata
    on first write):

    * ``"rename"`` (default) — the two-phase versioned directory swap:
      local-fast, recoverable, but rename of the LIVE bucket directory
      is a server-side copy on S3-like stores and leaves a window where
      the bucket is parked aside.
    * ``"manifest"`` — object-store-safe, bucketed workspaces only.
      Bucket data lives in immutable segment directories
      (``_bucket=k/seg-N/``); a per-table pointer file
      (``<table>/_manifest.json``) names the LIVE segments per bucket,
      and every mutation commits by atomically rewriting that one tiny
      file (PUT on S3, replace() locally). Live data directories are
      NEVER renamed or parked: appends install a new segment, rewrites
      point the bucket at a fresh segment and delete the displaced one
      only after the pointer landed. A crash before the pointer write
      leaves invisible garbage segments (vacuum reclaims); readers see
      either the old or the new table state, never a mix-in-progress.
    """

    def __init__(
        self, spark: SparkSession, path: str, commit_protocol: str | None = None
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        # URI scheme → Hadoop FileSystem API; bare path → os/shutil
        self._fs = (
            _HadoopFS(spark, self.path) if "://" in path else _LocalFS()
        )
        if commit_protocol not in (None, "rename", "manifest"):
            raise ValueError(f"unknown commit_protocol {commit_protocol!r}")
        self._requested_protocol = commit_protocol
        self._protocol_cache: str | None = None

    @property
    def _protocol(self) -> str:
        """Effective commit protocol: persisted registration wins (a
        workspace's layout is fixed at creation, like its bucket count);
        a ctor request applies to fresh workspaces and is persisted with
        the first write."""
        if self._protocol_cache is None:
            stored = self.get_metadata("commit_protocol")
            self._protocol_cache = (
                stored or self._requested_protocol or "rename"
            )
        return self._protocol_cache

    # -- manifest protocol primitives -------------------------------------
    def _manifest_file(self, name: str) -> str:
        return f"{self._tbl(name)}/_manifest.json"

    def _manifest(self, name: str) -> dict | None:
        """Live-segment pointer state for a manifest-managed table, or
        None when the table is rename-managed / absent. Shape:
        {"v": int, "buckets": {"<k>": ["seg-3", ...]}}."""
        import json

        raw = self._fs.read_text(self._manifest_file(name))
        return None if raw is None else json.loads(raw)

    def _save_manifest(self, name: str, m: dict) -> None:
        import json

        self._fs.write_text_atomic(self._manifest_file(name), json.dumps(m))

    def _seg_paths(self, name: str, m: dict) -> list[str]:
        t = self._tbl(name)
        return [
            f"{t}/_bucket={k}/{seg}"
            for k, segs in sorted(m["buckets"].items(), key=lambda kv: int(kv[0]))
            for seg in segs
        ]

    def _read_table(self, name: str) -> DataFrame:
        """Manifest-aware table read: rename-managed tables read the
        directory (partition discovery), manifest-managed tables read
        exactly the live segment directories (basePath keeps `_bucket`
        as a partition column; stale/garbage segments are invisible by
        construction)."""
        m = self._manifest(name)
        if m is None:
            return self.spark.read.parquet(self._tbl(name))
        paths = self._seg_paths(name, m)
        if not paths:
            raise ValueError(f"table {name!r} is empty (manifest has no segments)")
        return (
            self.spark.read.option("basePath", self._tbl(name)).parquet(*paths)
        )

    def _tbl(self, name: str) -> str:
        return f"{self.path}/{name}"

    def _exists(self, name: str) -> bool:
        m = self._manifest(name)
        if m is not None:
            return bool(m["buckets"])
        return self._fs.has_parquet(self._tbl(name))

    def _append_bucketed(self, name: str, df: DataFrame, bucketed: bool) -> None:
        """Append rows to a table under the active commit protocol."""
        if self._protocol != "manifest":
            writer = df.write.mode("append")
            if bucketed:
                writer = writer.partitionBy("_bucket")
            writer.parquet(self._tbl(name))
            return
        if not bucketed:
            raise ValueError(
                "manifest commit protocol requires bucketed tables "
                f"(append to {name!r} carried no _bucket column)"
            )
        self._manifest_install(name, df, replace=None)

    def _manifest_install(
        self, name: str, df: DataFrame, replace: list[int] | str | None
    ) -> None:
        """Stage-write ``df`` (partitioned by ``_bucket``), install each
        staged bucket directory as a fresh immutable segment, and COMMIT
        by atomically rewriting the per-table pointer file. Live data
        directories are never renamed or parked — the single rename here
        moves the freshly staged bytes into their permanent segment
        path, which no reader can see until the pointer names it.

        ``replace``: None = append (new segment ADDED to each staged
        bucket's live list); a bucket list = rewrite (those buckets'
        live lists REPLACED by the new segment — a bucket in the list
        with no staged rows was emptied and drops out); ``"all"`` = full
        table overwrite. Displaced segments are deleted only AFTER the
        pointer committed; a crash at any earlier point leaves invisible
        garbage for vacuum, never a broken table."""
        m = self._manifest(name) or {"v": 0, "buckets": {}}
        v = int(m["v"]) + 1
        seg = f"seg-{v}"
        stage = self._tbl(f"_{name}_stage")
        self._fs.rmtree(stage)
        df.write.mode("overwrite").partitionBy("_bucket").parquet(stage)
        staged = [
            d for d in self._fs.listdir(stage) if d.startswith("_bucket=")
        ]
        root = self._tbl(name)
        displaced: list[str] = []
        staged_keys: set[str] = set()
        for d in staged:
            k = d.split("=", 1)[1]
            staged_keys.add(k)
            dst = f"{root}/{d}/{seg}"
            # a retried crash can leave a same-version orphan (the
            # pointer never advanced, so v recomputes identically)
            self._fs.rmtree(dst)
            self._fs.makedirs(f"{root}/{d}")
            self._fs.rename(f"{stage}/{d}", dst)
        if replace == "all":
            for k, segs in m["buckets"].items():
                displaced += [f"{root}/_bucket={k}/{s}" for s in segs]
            m["buckets"] = {}
        elif replace is not None:
            for k in replace:
                segs = m["buckets"].pop(str(k), [])
                displaced += [f"{root}/_bucket={k}/{s}" for s in segs]
        for k in sorted(staged_keys, key=int):
            m["buckets"][k] = m["buckets"].get(k, []) + [seg]
        m["v"] = v
        self._save_manifest(name, m)  # THE commit point
        for p in displaced:
            self._fs.rmtree(p)
        self._fs.rmtree(stage)

    def _bucket_parquet_counts(self, name: str) -> dict[int, int] | None:
        """Per-bucket live parquet file counts for a bucketed table
        (compaction planning); None for an unbucketed directory layout."""
        root = self._tbl(name)

        def _count(d: str) -> int:
            return len(
                [
                    f
                    for f in self._fs.listdir(d)
                    if f.endswith(".parquet") and not f.startswith((".", "_"))
                ]
            )

        m = self._manifest(name)
        if m is not None:
            return {
                int(k): sum(_count(f"{root}/_bucket={k}/{s}") for s in segs)
                for k, segs in m["buckets"].items()
            }
        dirs = [e for e in self._fs.listdir(root) if e.startswith("_bucket=")]
        if not dirs:
            return None
        return {int(e.split("=", 1)[1]): _count(f"{root}/{e}") for e in dirs}

    def _guarded_batch_stats(self, batch: DataFrame, extra_aggs: list = ()):
        """ONE aggregate job running the whole-batch I17 dimension
        guardrail (first-row-only would let a mixed-dimension batch
        through) plus any caller aggregates. Returns the stats row, or
        None for an empty batch. Raises on mixed dims / dim mismatch."""
        from .functions.embed import check_dimension

        stats = batch.agg(
            F.count("*").alias("n"),
            F.countDistinct(F.size("embedding")).alias("ndims"),
            F.max(F.size("embedding")).alias("d"),
            *extra_aggs,
        ).collect()[0]
        if not stats["n"]:
            return None
        if stats["ndims"] != 1:
            raise ValueError(
                f"mixed embedding dimensions in one batch "
                f"({stats['ndims']} distinct sizes)"
            )
        registered = self.get_metadata("embedding_dimension")
        check_dimension(int(registered) if registered else None, int(stats["d"]))
        return stats

    # -- S1: chunk append with I17 dimension guardrail --------------------
    @_logged
    def add_chunks(self, chunks: DataFrame, partition_buckets: int | None = None) -> None:
        """Append chunks. With `partition_buckets`, rows land in
        hash-of-doc_id directory partitions (`_bucket=k/`): doc-scoped
        reads (context windows, point lookups, per-doc rebuilds) then
        prune to one directory instead of scanning the corpus — the
        100 TB layout. Mixing bucketed and unbucketed appends in one
        workspace is rejected."""
        self._add_chunks_impl(chunks, partition_buckets)

    def _add_chunks_impl(
        self,
        chunks: DataFrame,
        partition_buckets: int | None = None,
        stats=None,
    ) -> None:
        """Unlogged append core. merge_chunks delegates here on a fresh
        workspace so ONE logical mutation writes ONE `_history` row and
        runs the guarded-stats aggregate once (it passes the stats it
        already computed)."""
        if stats is None:
            stats = self._guarded_batch_stats(chunks)
        new_dim = int(stats["d"]) if stats is not None else None

        registered_buckets = self.get_metadata("partition_buckets")
        if registered_buckets is not None and int(registered_buckets) != (
            partition_buckets or 0
        ):
            raise ValueError(
                f"workspace is partitioned with {registered_buckets} buckets; "
                f"append requested {partition_buckets or 0}"
            )
        if self._protocol == "manifest" and not partition_buckets:
            raise ValueError(
                "manifest commit protocol requires a bucketed workspace "
                "(pass partition_buckets to add_chunks)"
            )
        if partition_buckets:
            chunks = chunks.withColumn(
                "_bucket",
                F.pmod(
                    F.xxhash64(F.col("doc_id").cast("string")),
                    F.lit(partition_buckets),
                ),
            )
            self._append_bucketed("chunks", chunks, bucketed=True)
        else:
            self._append_bucketed("chunks", chunks, bucketed=False)
        # register metadata only after the write succeeded, so a failed
        # append cannot leave a stale dimension/bucket registration
        if new_dim is not None:
            self.set_metadata("embedding_dimension", str(new_dim))
        self.set_metadata("partition_buckets", str(partition_buckets or 0))
        if self.get_metadata("commit_protocol") != self._protocol:
            self.set_metadata("commit_protocol", self._protocol)
        # index maintenance, not invalidation: a pure append only needs
        # the new rows signed and appended to the index
        self._ann_append(chunks)
        self._ivf_append(chunks)
        self._rollup_append(chunks)
        self._fts_append(chunks)
        self._dedup_append(chunks)
        self._simgraph_append(chunks)
        self._quot_append(chunks)

    def chunks_for_doc(self, doc_id: str) -> DataFrame:
        """Doc-scoped read. On a bucketed workspace the `_bucket`
        predicate is a partition filter — Spark lists exactly one
        directory (partition pruning), the point of the layout."""
        df = self.chunks()
        buckets = self.get_metadata("partition_buckets")
        if buckets and int(buckets) > 0:
            df = df.filter(
                F.col("_bucket")
                == F.pmod(
                    F.xxhash64(F.lit(str(doc_id))), F.lit(int(buckets))
                )
            )
        return df.filter(F.col("doc_id") == doc_id)

    def chunks_for_docs(self, doc_ids: list[str]) -> DataFrame:
        """Multi-doc scoped read (deep-dive context fetch). On a bucketed
        workspace the `_bucket IN (...)` predicate partition-prunes to the
        hit buckets; the bucket values for the literal doc ids are
        computed with one tiny local job (xxhash64 is a Spark expression,
        not reproducible driver-side)."""
        df = self.chunks()
        if not doc_ids:
            return df.limit(0)
        buckets = self.get_metadata("partition_buckets")
        if buckets and int(buckets) > 0:
            df = df.filter(
                F.col("_bucket").isin(self._doc_buckets(doc_ids, int(buckets)))
            )
        return df.filter(F.col("doc_id").isin(list(doc_ids)))

    def _doc_buckets(self, doc_ids: list[str], b: int) -> list[int]:
        """Bucket ids the given doc_ids hash to, via one tiny local job
        (xxhash64 is a Spark expression, not reproducible driver-side)."""
        return sorted(
            r["b"]
            for r in self.spark.createDataFrame(
                [(d,) for d in doc_ids], "doc_id string"
            )
            .select(
                F.pmod(
                    F.xxhash64(F.col("doc_id").cast("string")), F.lit(b)
                ).alias("b")
            )
            .distinct()
            .collect()
        )

    def chunks(self, fold_boosts: bool = True) -> DataFrame:
        """Chunk table with effective boost folded in: `boost_factor` is
        the stored base plus the summed `boosts` deltas (broadcast join
        against the tiny delta table). `fold_boosts=False` returns the
        raw stored rows (compaction/export internals)."""
        if not self._exists("chunks"):
            raise ValueError(
                f"workspace {self.path!r} has no chunks table — "
                "index documents first (Workspace.add_chunks / "
                "PvdbEngine.index_documents)"
            )
        df = self._read_table("chunks")
        if fold_boosts and self._exists("boosts"):
            deltas = (
                self.spark.read.parquet(self._tbl("boosts"))
                .groupBy(F.col("chunk_id").alias("id"))
                .agg(F.sum("delta").alias("_boost_delta"))
            )
            cols = df.columns
            df = (
                df.join(F.broadcast(deltas), "id", "left")
                .withColumn(
                    "boost_factor",
                    F.col("boost_factor")
                    + F.coalesce(F.col("_boost_delta"), F.lit(0.0)),
                )
                .select(*cols)
            )
        return df

    # -- FTS index: derived by default, optionally PERSISTED + maintained
    # (vs vector_store.cpp:192-201 — the reference's FTS5 is a real
    # at-rest index; dual-write consistency risk is avoided here because
    # maintenance rides the SAME doc-keyed bucket-scoped DML as chunks)
    def fts_index(self) -> DataFrame:
        """(token, id) inverted index. With `build_fts()` done, this is
        a scan of the maintained `fts` table — serving no longer pays a
        corpus tokenize + distinct per query (the 100 TB difference
        between having an index and deriving one). Without it, derived
        on the fly (small corpora, ad-hoc frames)."""
        if self._fts_enabled() and self._exists("fts"):
            return self._read_table("fts").select("token", "id")
        return build_fts_index(
            self.chunks(), id_col="id", text_col="text", heading_col="heading_path"
        )

    def _fts_enabled(self) -> bool:
        return self.get_metadata("fts_enabled") == "1"

    def _fts_rows(self, chunk_rows: DataFrame) -> DataFrame:
        """Posting rows for a batch of chunk rows: (token, id, doc_id
        [, _bucket]) — doc_id/_bucket carried so the index maintains
        with the same doc-keyed, bucket-scoped rewrites as the chunk
        table. Heading tokens are indexed too (the reference's
        `[CONTEXT: <heading>]` augmentation)."""
        from .functions.text import tokens

        body = F.concat_ws(
            " ", F.coalesce(F.col("heading_path"), F.lit("")), F.col("text")
        )
        carry = [F.col("doc_id")] + (
            [F.col("_bucket")] if "_bucket" in chunk_rows.columns else []
        )
        return chunk_rows.select(
            F.col("id"), *carry, F.explode(tokens(body)).alias("token")
        ).distinct()

    @_logged
    def build_fts(self) -> int:
        """Persist the inverted index as a maintained `fts` table and
        turn on maintenance for all subsequent DML. Returns posting rows
        written. Like ann/ivf/rollup, the table partitions by `_bucket`
        on a bucketed workspace so doc-level DML rewrites one index
        bucket, not the index."""
        self.set_metadata("fts_enabled", "1")
        rows = self._fts_rows(self.chunks(fold_boosts=False))
        self._overwrite("fts", rows)
        return self._read_table("fts").count()

    def _fts_append(self, chunk_rows: DataFrame) -> None:
        """Index maintenance for a pure append: tokenize the batch,
        append the postings. O(batch), no corpus read."""
        if not self._fts_enabled() or not self._exists("fts"):
            return
        rows = self._fts_rows(chunk_rows)
        self._append_bucketed("fts", rows, "_bucket" in rows.columns)

    def _fts_replace_docs(
        self,
        doc_keys,
        new_rows: DataFrame | None,
        affected: list[int] | None,
    ) -> None:
        """Index maintenance for doc-level MERGE/DELETE: drop the touched
        docs' postings (doc-keyed anti-join), insert fresh ones;
        bucket-scoped swap when partitioned."""
        if not self._fts_enabled() or not self._exists("fts"):
            return
        fresh = self._fts_rows(new_rows) if new_rows is not None else None
        if affected:
            cur = self._read_table("fts").filter(
                F.col("_bucket").isin(affected)  # partition-pruned read
            )
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh is not None:
                merged = merged.unionByName(fresh)
            self._swap_buckets("fts", merged, affected)
        else:
            cur = self._read_table("fts")
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh is not None:
                merged = merged.unionByName(fresh)
            self._overwrite("fts", merged)

    # -- S5 / S4 ----------------------------------------------------------
    def count(self) -> int:
        return self.chunks().count() if self._exists("chunks") else 0

    @_logged
    def clear(self) -> None:
        for t in (
            "chunks", "boosts", "ann_lsh", "doc_rollup",
            "ann_ivf", "ann_ivf_centroids", "fts",
        ):
            self._fs.rmtree(self._tbl(t))
        self.delete_metadata("ann_params")
        self.delete_metadata("ivf_params")
        self.delete_metadata("doc_rollup")
        self.delete_metadata("fts_enabled")
        # a cleared workspace is a FRESH workspace: the dimension, the
        # bucket-layout and the commit-protocol registrations must all
        # go, or the next add_chunks would be locked to the old layout
        self.delete_metadata("embedding_dimension")
        self.delete_metadata("partition_buckets")
        self.delete_metadata("commit_protocol")
        self._protocol_cache = None

    # -- S6: boost update (append-only delta, folded at read) -------------
    @_logged
    def boost_entry(
        self, chunk_id: int, amount: float = 0.1, doc_id: str | None = None
    ) -> None:
        """One click = one appended (chunk_id, delta, doc_id) row; the
        corpus is never rewritten (reference UPDATE semantics,
        `vector_store.cpp:789-795`, without the 100 TB rewrite). Pass
        the chunk's doc_id when the caller knows it: compaction can then
        map deltas to buckets from the tiny boosts table alone, instead
        of scanning the corpus' (id, _bucket) columns."""
        self.spark.createDataFrame(
            [(int(chunk_id), float(amount), doc_id)],
            "chunk_id long, delta double, doc_id string",
        ).write.mode("append").parquet(self._tbl("boosts"))

    @_logged
    def compact_boosts(self) -> None:
        """Fold accumulated boost deltas into the stored chunk rows and
        drop the delta table. On a bucketed workspace only the buckets
        that actually contain boosted chunks are rewritten (found with a
        column-pruned (id, _bucket) scan + broadcast semi-join — thin
        read, no corpus rewrite); unbucketed falls back to one full
        rewrite. Reads see identical effective boosts before and after."""
        if not self._exists("boosts"):
            return
        b = int(self.get_metadata("partition_buckets") or 0)
        if b <= 0:
            self._overwrite("chunks", self.chunks(fold_boosts=True))
        else:
            boosts = self.spark.read.parquet(self._tbl("boosts"))
            known = (
                [r["doc_id"] for r in boosts.select("doc_id").distinct().collect()]
                if "doc_id" in boosts.columns
                else [None]
            )
            if None not in known:
                # every delta carries its doc_id: bucket set comes from
                # the tiny boosts table, zero corpus reads
                affected = self._doc_buckets(known, b)
            else:
                # fallback: thin column-pruned (id, _bucket) scan
                boosted = boosts.select(F.col("chunk_id").alias("id")).distinct()
                affected = sorted(
                    r["_bucket"]
                    for r in self._read_table("chunks")
                    .join(F.broadcast(boosted), "id", "left_semi")
                    .select("_bucket")
                    .distinct()
                    .collect()
                )
            if affected:
                folded = self.chunks(fold_boosts=True).filter(
                    F.col("_bucket").isin(affected)
                )
                self._swap_buckets("chunks", folded, affected)
        self._fs.rmtree(self._tbl("boosts"))

    # -- MERGE/DELETE: bucket-scoped DML (reference UPDATE/DELETE rows,
    # `vector_store.cpp:789-795`; Delta-style MERGE INTO semantics
    # without the Delta dependency) ---------------------------------------
    @_logged
    def merge_chunks(self, updates: DataFrame, key: str = "id") -> None:
        """Document-level upsert (the reference's re-index flow): every
        stored chunk of a doc_id present in `updates` is dropped and the
        doc's new chunks are inserted — so a revision with FEWER chunks
        leaves no stale survivors (an id-keyed merge would). Docs not in
        `updates` are untouched; previously-unknown docs are inserted.
        On a bucketed workspace only the `_bucket=k` directories the
        updated doc_ids hash to are read and rewritten — re-indexing one
        changed document touches one bucket out of the corpus, which is
        what makes updates viable at 100 TB. `updates` must carry full
        chunk rows (CHUNK_COLUMNS, including doc_id)."""
        # within-batch dedupe with a DETERMINISTIC winner: at-least-once
        # delivery can put the same chunk in ONE batch twice — possibly
        # as two versions (v1 + v2 files landing in the same micro-
        # batch). Latest created_at wins; an arbitrary dropDuplicates
        # pick could silently keep the stale version forever.
        w = Window.partitionBy(key).orderBy(F.col("created_at").desc())
        updates = (
            updates.select(*CHUNK_COLUMNS)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        b = int(self.get_metadata("partition_buckets") or 0)
        updates_b = updates
        extra = []
        if b > 0:
            updates_b = updates.withColumn(
                "_bucket",
                F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(b)),
            )
            # collect_set is bounded by the bucket count, never batch size
            extra = [F.collect_set("_bucket").alias("buckets")]
        # ONE job: I17 guardrail + affected-bucket set
        stats = self._guarded_batch_stats(updates_b, extra)
        if stats is None:
            return
        if not self._exists("chunks"):
            self._add_chunks_impl(updates, partition_buckets=b or None, stats=stats)
            return
        # replace-by-document: anti-join the stored rows against the
        # batch's doc_ids (broadcast; left_anti only tests existence so
        # no distinct() — that would cost a shuffle stage)
        doc_keys = F.broadcast(updates_b.select("doc_id"))
        if b <= 0:
            merged = (
                self.chunks(fold_boosts=False)
                .join(doc_keys, "doc_id", "left_anti")
                .unionByName(updates)
            )
            self._overwrite("chunks", merged)
            self._ann_replace_docs(doc_keys, updates, None)
            self._ivf_replace_docs(doc_keys, updates, None)
            self._rollup_replace_docs(doc_keys, updates, None)
            self._fts_replace_docs(doc_keys, updates, None)
            self._dedup_replace_docs(doc_keys, updates, None)
            self._simgraph_replace_docs(doc_keys, updates, None)
            self._quot_replace_docs(doc_keys, updates)
            return
        affected = sorted(stats["buckets"])
        current = self._read_table("chunks").filter(
            F.col("_bucket").isin(affected)  # partition-pruned read
        )
        merged = current.join(doc_keys, "doc_id", "left_anti").unionByName(updates_b)
        self._swap_buckets("chunks", merged, affected)
        # index and rollup maintenance mirror the chunk rewrite: same doc
        # keys, same affected buckets, fresh rows for the new versions
        self._ann_replace_docs(doc_keys, updates_b, affected)
        self._ivf_replace_docs(doc_keys, updates_b, affected)
        self._rollup_replace_docs(doc_keys, updates_b, affected)
        self._fts_replace_docs(doc_keys, updates_b, affected)
        self._dedup_replace_docs(doc_keys, updates_b, affected)
        self._simgraph_replace_docs(doc_keys, updates_b, affected)
        self._quot_replace_docs(doc_keys, updates_b)

    @_logged
    def delete_doc(self, doc_id: str) -> None:
        """Remove every chunk of one document. Bucketed: rewrites only
        the single bucket directory the doc hashes to. Orphaned boost
        deltas (if the doc's chunks were boosted) are inert — the fold
        join finds no matching id — and vanish at the next compact."""
        if not self._exists("chunks"):
            return
        b = int(self.get_metadata("partition_buckets") or 0)
        doc_keys = F.broadcast(
            self.spark.createDataFrame([(doc_id,)], "doc_id string")
        )
        if b <= 0:
            remaining = self.chunks(fold_boosts=False).filter(
                F.col("doc_id") != doc_id
            )
            self._overwrite("chunks", remaining)
            self._ann_replace_docs(doc_keys, None, None)
            self._ivf_replace_docs(doc_keys, None, None)
            self._rollup_replace_docs(doc_keys, None, None)
            self._fts_replace_docs(doc_keys, None, None)
            self._dedup_replace_docs(doc_keys, None, None)
            self._simgraph_replace_docs(doc_keys, None, None)
            self._quot_replace_docs(doc_keys, None)
            return
        affected = self._doc_buckets([doc_id], b)
        remaining = (
            self._read_table("chunks")
            .filter(F.col("_bucket").isin(affected))
            .filter(F.col("doc_id") != doc_id)
        )
        self._swap_buckets("chunks", remaining, affected)
        self._ann_replace_docs(doc_keys, None, affected)
        self._ivf_replace_docs(doc_keys, None, affected)
        self._rollup_replace_docs(doc_keys, None, affected)
        self._fts_replace_docs(doc_keys, None, affected)
        self._dedup_replace_docs(doc_keys, None, affected)
        self._simgraph_replace_docs(doc_keys, None, affected)
        self._quot_replace_docs(doc_keys, None)

    def _swap_buckets(self, name: str, df: DataFrame, buckets: list[int]) -> None:
        """Per-bucket versioned swap: write only the given `_bucket`
        partitions of `df` to a tmp table, then swap each bucket
        directory into place. Untouched bucket directories are never
        read, written, or renamed. The displaced version is parked at
        the workspace root (NOT inside the table dir — a leftover
        `...=...` directory inside it would be misread as a partition),
        so the worst crash leaves the old bucket recoverable beside the
        table, never a half-written bucket in it.

        Manifest protocol: delegates to the pointer-file commit — live
        bucket directories are never renamed (object-store-safe)."""
        if self._protocol == "manifest":
            self._manifest_install(name, df, replace=buckets)
            return
        # refuse to proceed over UNRECOVERED crash leftovers: a parked
        # old-bucket copy whose live bucket directory is missing means a
        # prior swap crashed between its two renames — the parked copy is
        # the ONLY copy of that bucket, and this swap's input was read
        # WITHOUT those rows, so continuing would silently drop them.
        self._ensure_recovered(name)
        tmp = self._tbl(f"_{name}_tmp")
        self._fs.rmtree(tmp)
        df.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        final = self._tbl(name)
        olds = []
        # two-phase: swap every bucket FIRST, delete displaced versions
        # only after all swaps landed — a crash mid-operation then leaves
        # every pre-operation bucket copy on disk (recoverable), never a
        # mix with some old versions already destroyed
        for k in buckets:
            src = f"{tmp}/_bucket={k}"
            dst = f"{final}/_bucket={k}"
            old = self._tbl(f"_{name}_old_bucket_{k}")
            self._fs.rmtree(old)  # leftover from a crash
            if self._fs.isdir(dst):
                self._fs.rename(dst, old)
                olds.append(old)
            if self._fs.isdir(src):
                self._fs.rename(src, dst)
            # else: every row in this bucket was deleted — dir stays gone
        for old in olds:
            self._fs.rmtree(old)
        self._fs.rmtree(tmp)

    def _ensure_recovered(self, name: str) -> None:
        """Raise if a crash left a parked `_<name>_old_bucket_<k>` whose
        live bucket directory is gone (the parked dir is the only copy)."""
        prefix = f"_{name}_old_bucket_"
        for entry in self._list_root():
            if not entry.startswith(prefix):
                continue
            k = entry[len(prefix):]
            if not self._fs.isdir(f"{self._tbl(name)}/_bucket={k}"):
                raise RuntimeError(
                    f"workspace has an unrecovered crash leftover "
                    f"({entry}: live bucket {k} of {name!r} is missing; "
                    f"the parked copy is the only one) — call recover() "
                    f"before mutating"
                )

    def _list_root(self) -> list[str]:
        try:
            return self._fs.listdir(self.path)
        except (FileNotFoundError, OSError):
            return []

    def recover(self) -> dict:
        """Crash recovery for the versioned-swap protocol: restore every
        bucket whose live directory vanished mid-swap. The parked
        pre-operation copy (`_<t>_old_bucket_<k>`) is preferred — it
        rolls the crashed operation back for that bucket, and retrying
        the failed operation (doc-level DML is idempotent) converges the
        table. A bucket present only in the operation's `_<t>_tmp`
        output (a brand-new bucket whose install crashed) is completed
        forward from tmp. Returns {"restored": [{table, bucket, from}]}.
        """
        restored = []
        # pass 1: roll back from parked pre-op copies
        for entry in sorted(self._list_root()):
            if "_old_bucket_" not in entry or not entry.startswith("_"):
                continue
            path = f"{self.path}/{entry}"
            if not self._fs.isdir(path):
                continue
            base = entry[1 : entry.index("_old_bucket_")]
            k = entry.rsplit("_old_bucket_", 1)[1]
            dst = f"{self._tbl(base)}/_bucket={k}"
            if not self._fs.isdir(dst):
                self._fs.rename(path, dst)
                restored.append({"table": base, "bucket": k, "from": "old"})
        # pass 2: complete forward any bucket that exists only in tmp
        for entry in sorted(self._list_root()):
            if not (entry.startswith("_") and entry.endswith("_tmp")):
                continue
            path = f"{self.path}/{entry}"
            if not self._fs.isdir(path):
                continue
            base = entry[1:-4]
            for d in self._fs.listdir(path):
                if not d.startswith("_bucket="):
                    continue
                dst = f"{self._tbl(base)}/{d}"
                if not self._fs.isdir(dst):
                    self._fs.rename(f"{path}/{d}", dst)
                    restored.append(
                        {"table": base, "bucket": d.split("=", 1)[1], "from": "tmp"}
                    )
        return {"restored": restored}

    # -- ANN index: persisted LSH bucket table (precompute-once) ----------
    @_logged
    def build_ann_index(self, dim: int, n_planes: int = 4, n_tables: int = 16) -> int:
        """Precompute the RP-LSH bucket table over the chunk embeddings
        and persist it (`ann_lsh` table + params in metadata). The scale
        contract: the corpus is signed ONCE here; each search then probes
        O(n_tables) tiny bucket keys instead of scanning every vector.

        The index is MAINTAINED through DML, not dropped (r3): rows
        carry doc_id, and on a bucketed workspace the chunk's `_bucket`
        partitions the index directory too — so add/merge/delete update
        the index with the same doc-keyed, bucket-scoped rewrites as the
        chunk table (re-signing only the touched documents' chunks, one
        index bucket out of the corpus). Returns index rows written."""
        from .operators.similarity import rp_lsh_buckets

        b = int(self.get_metadata("partition_buckets") or 0)
        carry = ("doc_id", "_bucket") if b > 0 else ("doc_id",)
        vecs = self.chunks(fold_boosts=False).select(
            F.col("id").alias("vec_id"), "embedding", *carry
        )
        buckets = rp_lsh_buckets(
            vecs, dim, n_planes=n_planes, n_tables=n_tables, carry_cols=carry
        )
        self._overwrite("ann_lsh", buckets)  # partitions by _bucket if present
        self.set_metadata("ann_params", f"{dim},{n_planes},{n_tables}")
        return self._read_table("ann_lsh").count()

    def _ann_sigs(self, chunk_rows: DataFrame) -> DataFrame | None:
        """Signatures for a batch of chunk rows under the registered ANN
        params, carrying the maintenance keys. None when no index."""
        params = self.get_metadata("ann_params")
        if params is None or not self._exists("ann_lsh"):
            return None
        from .operators.similarity import rp_lsh_buckets

        dim, n_planes, n_tables = (int(x) for x in params.split(","))
        carry = (
            ("doc_id", "_bucket")
            if "_bucket" in chunk_rows.columns
            else ("doc_id",)
        )
        return rp_lsh_buckets(
            chunk_rows.select(F.col("id").alias("vec_id"), "embedding", *carry),
            dim, n_planes=n_planes, n_tables=n_tables, carry_cols=carry,
        )

    def _ann_append(self, chunk_rows: DataFrame) -> None:
        """Index maintenance for a pure append: sign the batch, append."""
        sigs = self._ann_sigs(chunk_rows)
        if sigs is None:
            return
        self._append_bucketed("ann_lsh", sigs, "_bucket" in sigs.columns)

    def _ann_replace_docs(
        self,
        doc_keys,
        new_rows: DataFrame | None,
        affected: list[int] | None,
    ) -> None:
        """Index maintenance for doc-level MERGE/DELETE: drop the touched
        docs' signature rows (doc-keyed anti-join) and insert fresh ones;
        bucket-scoped swap when the index is partitioned (`affected` =
        the same bucket set the chunk rewrite touched), full index
        rewrite otherwise (index rows are id+bucket sized — far smaller
        than the corpus either way)."""
        if self.get_metadata("ann_params") is None or not self._exists("ann_lsh"):
            return
        sigs = self._ann_sigs(new_rows) if new_rows is not None else None
        if affected:
            cur = self._read_table("ann_lsh").filter(
                F.col("_bucket").isin(affected)  # partition-pruned read
            )
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if sigs is not None:
                merged = merged.unionByName(sigs)
            self._swap_buckets("ann_lsh", merged, affected)
        else:
            cur = self._read_table("ann_lsh")
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if sigs is not None:
                merged = merged.unionByName(sigs)
            self._overwrite("ann_lsh", merged)

    def ann_index(self):
        """(buckets DataFrame, dim, n_planes, n_tables) or None if no
        valid index exists."""
        params = self.get_metadata("ann_params")
        if params is None or not self._exists("ann_lsh"):
            return None
        dim, n_planes, n_tables = (int(x) for x in params.split(","))
        return self._read_table("ann_lsh"), dim, n_planes, n_tables

    def _invalidate_ann(self) -> None:
        self._fs.rmtree(self._tbl("ann_lsh"))
        self.delete_metadata("ann_params")

    # -- IVF index: persisted coarse-quantizer assignments ----------------
    #
    # Second maintained index family (the RP-LSH table above being the
    # first): centroids are trained ONCE at build (seeded k-means++ over
    # a deterministic sample) and persisted; the assignment table
    # (id -> nearest centroid) is then maintained through DML exactly
    # like the chunk table — appends assign only the batch (broadcast
    # literal centroids, map-side), doc-level MERGE/DELETE swap only the
    # touched buckets. Assignment is deterministic given the persisted
    # centroids, so "maintained == rebuild" is testable bit-for-bit.

    @_logged
    def build_ivf_index(
        self,
        dim: int,
        n_centroids: int | None = None,
        n_iter: int = 3,
        sample_size: int = 2048,
        seed: int = 42,
    ) -> int:
        """Train centroids on the current corpus, persist them, assign
        every chunk. Returns the assignment row count.

        ``n_centroids=None`` auto-sizes from the corpus
        (similarity.ivf_auto_params: 2*sqrt(N) cells — the rule that
        lifts worst-case recall@10 from 0.59 to 0.83, VERDICT r7 #2)."""
        from .operators.similarity import ivf_auto_params, kmeans_centroids

        chunks = self._read_table("chunks")
        vecs = chunks.select(F.col("id").alias("vec_id"), "embedding")
        if n_centroids is None:
            n_centroids, _ = ivf_auto_params(vecs.count())
        cents = kmeans_centroids(
            vecs, n_centroids, n_iter=n_iter, sample_size=sample_size, seed=seed
        )
        cdf = self.spark.createDataFrame(
            [(int(cid), [float(x) for x in v]) for cid, v in cents],
            "centroid_id int, vector array<double>",
        )
        self._overwrite("ann_ivf_centroids", cdf)
        assigned = self._ivf_assign_rows(chunks, cents)
        self._overwrite("ann_ivf", assigned)
        self.set_metadata("ivf_params", f"{int(dim)},{len(cents)}")
        return self._read_table("ann_ivf").count()

    def _ivf_centroids(self) -> list[tuple[int, list[float]]] | None:
        if self.get_metadata("ivf_params") is None or not self._exists(
            "ann_ivf_centroids"
        ):
            return None
        rows = (
            self.spark.read.parquet(self._tbl("ann_ivf_centroids"))
            .orderBy("centroid_id")
            .collect()
        )
        return [(int(r["centroid_id"]), list(r["vector"])) for r in rows]

    def _ivf_assign_rows(self, chunk_rows: DataFrame, cents) -> DataFrame:
        from .operators.similarity import ivf_assign

        carry = (
            ("doc_id", "_bucket")
            if "_bucket" in chunk_rows.columns
            else ("doc_id",)
        )
        return ivf_assign(
            chunk_rows.select(F.col("id").alias("vec_id"), "embedding", *carry),
            cents,
            carry_cols=carry,
        )

    def _ivf_append(self, chunk_rows: DataFrame) -> None:
        cents = self._ivf_centroids()
        if cents is None or not self._exists("ann_ivf"):
            return
        assigned = self._ivf_assign_rows(chunk_rows, cents)
        self._append_bucketed("ann_ivf", assigned, "_bucket" in assigned.columns)

    def _ivf_replace_docs(
        self,
        doc_keys,
        new_rows: DataFrame | None,
        affected: list[int] | None,
    ) -> None:
        cents = self._ivf_centroids()
        if cents is None or not self._exists("ann_ivf"):
            return
        fresh = (
            self._ivf_assign_rows(new_rows, cents) if new_rows is not None else None
        )
        if affected:
            cur = self._read_table("ann_ivf").filter(
                F.col("_bucket").isin(affected)  # partition-pruned read
            )
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh is not None:
                merged = merged.unionByName(fresh)
            self._swap_buckets("ann_ivf", merged, affected)
        else:
            cur = self._read_table("ann_ivf")
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh is not None:
                merged = merged.unionByName(fresh)
            self._overwrite("ann_ivf", merged)

    def ivf_index(self):
        """(assignments DataFrame, centroids, dim, k) or None."""
        cents = self._ivf_centroids()
        if cents is None or not self._exists("ann_ivf"):
            return None
        dim, k = (int(x) for x in self.get_metadata("ivf_params").split(","))
        return self._read_table("ann_ivf"), cents, dim, k

    # -- dedup LSH index: persisted minhash band table ---------------------
    #
    # Third maintained index family (RP-LSH buckets and IVF assignments
    # above): the corpus side of incremental arrival dedup. Without it,
    # every arriving batch re-shingles and re-signs the WHOLE corpus to
    # build its band keys — measured 65 s for a 10-doc arrival on the
    # 50k-doc 10x workspace, all corpus-side minhash. With the band
    # table persisted and maintained through DML like the chunk table,
    # a batch arrival is: sign the batch (O(batch)), broadcast its band
    # keys into ONE scan of this table, verify exact Jaccard on the
    # candidates only. This is the batch analog of the reference's
    # per-file identity check against the store (mainwindow.cpp:713-761).

    @_logged
    def build_dedup_index(
        self, n: int = 3, n_hashes: int = 16, band_size: int = 4
    ) -> int:
        """Sign the current corpus once and persist the band table
        (`dedup_lsh`: id, doc_id, band, band_key[, _bucket]); register
        the params so DML maintenance and later arrivals sign batches
        identically. Returns band rows written."""
        self.set_metadata("dedup_params", f"{n},{n_hashes},{band_size}")
        rows = self._dedup_rows(self.chunks(fold_boosts=False))
        self._overwrite("dedup_lsh", rows)
        return self._read_table("dedup_lsh").count()

    def _dedup_params(self) -> tuple[int, int, int] | None:
        p = self.get_metadata("dedup_params")
        if p is None:
            return None
        n, h, b = (int(x) for x in p.split(","))
        return n, h, b

    def _dedup_rows(self, chunk_rows: DataFrame) -> DataFrame:
        """Band rows for a batch of chunk rows under the registered
        params, carrying the doc-keyed maintenance columns."""
        from .operators.dedup import (
            lsh_band_keys,
            minhash_signatures,
            word_shingles,
        )

        n, n_hashes, band_size = self._dedup_params()
        carry_cols = ["id", "doc_id"] + (
            ["_bucket"] if "_bucket" in chunk_rows.columns else []
        )
        sh = word_shingles(
            chunk_rows.select("id", "text"), n, id_col="id", text_col="text"
        )
        bands = lsh_band_keys(
            minhash_signatures(sh, n_hashes), n_hashes, band_size
        )
        return bands.join(chunk_rows.select(*carry_cols), "id")

    def dedup_index(self):
        """(band table DataFrame, n, n_hashes, band_size) or None."""
        params = self._dedup_params()
        if params is None or not self._exists("dedup_lsh"):
            return None
        return (self._read_table("dedup_lsh"), *params)

    def _dedup_append(self, chunk_rows: DataFrame) -> None:
        if self._dedup_params() is None or not self._exists("dedup_lsh"):
            return
        rows = self._dedup_rows(chunk_rows)
        self._append_bucketed("dedup_lsh", rows, "_bucket" in rows.columns)

    def _dedup_replace_docs(
        self,
        doc_keys,
        new_rows: DataFrame | None,
        affected: list[int] | None,
    ) -> None:
        if self._dedup_params() is None or not self._exists("dedup_lsh"):
            return
        fresh = self._dedup_rows(new_rows) if new_rows is not None else None
        if affected:
            cur = self._read_table("dedup_lsh").filter(
                F.col("_bucket").isin(affected)  # partition-pruned read
            )
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh is not None:
                merged = merged.unionByName(fresh)
            self._swap_buckets("dedup_lsh", merged, affected)
        else:
            cur = self._read_table("dedup_lsh")
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh is not None:
                merged = merged.unionByName(fresh)
            self._overwrite("dedup_lsh", merged)

    # -- similarity-graph index: persisted simhash bands + pair table ----
    #
    # Fourth maintained index family (VERDICT r11 #2, after RP-LSH,
    # IVF and dedup-LSH): the graph analyses (pagerank / triangles /
    # k-core / BFS / link prediction) all consume ONE artifact — the
    # simhash near-dup pair table — and at stress tiers rebuilding it
    # per session cost 195-650 s. Persist it once: `simgraph_bands`
    # (id, doc_id, simhash, band, band_val[, _bucket]) is the banded
    # signature index, `simgraph_pairs` (id_a, id_b, hamming, doc_a,
    # doc_b) the verified adjacency. Arrivals update in O(batch): sign
    # the batch, band-join it against the maintained band table (the
    # incident one-sided plan — candidate volume is batch x bucket,
    # never the corpus pair family), verify hamming, append. Doc-level
    # MERGE/DELETE drop the touched docs' bands (bucket-scoped when
    # partitioned) and their incident pairs (doc-keyed anti-joins on
    # doc_a/doc_b — the pair table is deliberately NOT bucketed: a pair
    # spans two buckets), then insert fresh rows the same incident way.
    # Deterministic banding makes "maintained == rebuild" testable
    # bit-for-bit, the band-index idiom.

    def build_sim_graph_index(
        self, max_hamming: int = 3, band_bits: int = 7
    ) -> int:
        """Sign the current corpus, persist the band table and the
        verified near-dup pair table; register params so DML
        maintenance signs batches identically. Returns pairs written."""
        from .operators.dedup import SIMHASH_BITS

        self.set_metadata(
            "simgraph_params", f"{max_hamming},{SIMHASH_BITS},{band_bits}"
        )
        bands = self._simgraph_bands(self.chunks(fold_boosts=False))
        self._overwrite("simgraph_bands", bands)
        bands = self._read_table("simgraph_bands")
        pairs = self._simgraph_pairs_from_bands(bands)
        self._overwrite("simgraph_pairs", pairs)
        return self._read_table("simgraph_pairs").count()

    def _simgraph_params(self) -> tuple[int, int, int] | None:
        p = self.get_metadata("simgraph_params")
        if p is None:
            return None
        mh, bits, bb = (int(x) for x in p.split(","))
        return mh, bits, bb

    def _simgraph_bands(self, chunk_rows: DataFrame) -> DataFrame:
        """Band rows for a batch under the registered params, carrying
        the doc-keyed (and bucket, when partitioned) maintenance
        columns."""
        from .operators.dedup import simhash_band_keys, simhash_signatures

        _mh, bits, band_bits = self._simgraph_params()
        carry_cols = ["id", "doc_id"] + (
            ["_bucket"] if "_bucket" in chunk_rows.columns else []
        )
        sigs = simhash_signatures(
            chunk_rows.select("id", "text"), bits, id_col="id", text_col="text"
        )
        bands = simhash_band_keys(sigs, bits, band_bits)
        return bands.join(
            chunk_rows.select(*carry_cols), "id"
        ).select("id", "doc_id", "simhash", "band", "band_val", *(
            ["_bucket"] if "_bucket" in chunk_rows.columns else []
        ))

    def _simgraph_pairs_from_bands(self, bands: DataFrame) -> DataFrame:
        """Verified (id_a < id_b, hamming, doc_a, doc_b) from a band
        table — the same band-equi-join + bit_count(xor) verify as
        operators/dedup.simhash_pairs, keyed on the PERSISTED bands so
        build and maintenance share one candidate rule."""
        mh, _bits, _bb = self._simgraph_params()
        a = bands.select(
            F.col("id").alias("id_a"), F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("sa"), "band", "band_val",
        )
        b = bands.select(
            F.col("id").alias("id_b"), F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("sb"), "band", "band_val",
        )
        cand = (
            a.join(b, ["band", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sa", "sb", "doc_a", "doc_b")
            .distinct()
        )
        return (
            cand.withColumn(
                "hamming", F.bit_count(F.expr("sa ^ sb")).cast("long")
            )
            .filter(F.col("hamming") <= mh)
            .select("id_a", "id_b", "hamming", "doc_a", "doc_b")
        )

    def _simgraph_incident_pairs(
        self, new_bands: DataFrame, all_bands: DataFrame
    ) -> DataFrame:
        """Pairs incident to a batch, one-sided: the (small) batch band
        keys join the full band table — O(batch x bucket) candidates,
        never the corpus pair family. `all_bands` must already include
        `new_bands` so within-batch pairs are found too; least/greatest
        + distinct emits each pair once."""
        mh, _bits, _bb = self._simgraph_params()
        q = new_bands.select(
            F.col("id").alias("qid"), F.col("doc_id").alias("qdoc"),
            F.col("simhash").alias("qsig"), "band", "band_val",
        )
        cand = (
            all_bands.join(q, ["band", "band_val"])
            .filter(F.col("id") != F.col("qid"))
            .select(
                F.least("id", "qid").alias("id_a"),
                F.greatest("id", "qid").alias("id_b"),
                F.when(F.col("id") < F.col("qid"), F.col("simhash"))
                .otherwise(F.col("qsig")).alias("sa"),
                F.when(F.col("id") < F.col("qid"), F.col("qsig"))
                .otherwise(F.col("simhash")).alias("sb"),
                F.when(F.col("id") < F.col("qid"), F.col("doc_id"))
                .otherwise(F.col("qdoc")).alias("doc_a"),
                F.when(F.col("id") < F.col("qid"), F.col("qdoc"))
                .otherwise(F.col("doc_id")).alias("doc_b"),
            )
            .distinct()
        )
        return (
            cand.withColumn(
                "hamming", F.bit_count(F.expr("sa ^ sb")).cast("long")
            )
            .filter(F.col("hamming") <= mh)
            .select("id_a", "id_b", "hamming", "doc_a", "doc_b")
        )

    def sim_graph_index(self):
        """(pair table DataFrame, max_hamming, bits, band_bits) or None.
        The pair table is the graph family's direct input: e.g.
        pagerank(ws.sim_graph_index()[0].select("id_a", "id_b"))."""
        params = self._simgraph_params()
        if params is None or not self._exists("simgraph_pairs"):
            return None
        return (self._read_table("simgraph_pairs"), *params)

    def _simgraph_append(self, chunk_rows: DataFrame) -> None:
        """O(batch) arrival maintenance: sign the batch, find pairs
        incident to it against the maintained bands, append both."""
        if self._simgraph_params() is None or not self._exists(
            "simgraph_bands"
        ):
            return
        new_bands = self._simgraph_bands(chunk_rows).localCheckpoint(
            eager=True
        )
        all_bands = self._read_table("simgraph_bands").select(
            "id", "doc_id", "simhash", "band", "band_val"
        ).unionByName(
            new_bands.select("id", "doc_id", "simhash", "band", "band_val")
        )
        fresh = self._simgraph_incident_pairs(new_bands, all_bands)
        self._append_bucketed(
            "simgraph_bands", new_bands, "_bucket" in new_bands.columns
        )
        self._append_bucketed("simgraph_pairs", fresh, False)

    def _simgraph_replace_docs(
        self,
        doc_keys,
        new_rows: DataFrame | None,
        affected: list[int] | None,
    ) -> None:
        """Doc-level MERGE/DELETE maintenance: drop the touched docs'
        band rows (bucket-scoped swap when partitioned) and every pair
        with a removed endpoint, then insert the new versions' bands
        and their incident pairs against the post-delete band table."""
        if self._simgraph_params() is None or not self._exists(
            "simgraph_bands"
        ):
            return
        fresh_bands = (
            self._simgraph_bands(new_rows).localCheckpoint(eager=True)
            if new_rows is not None
            else None
        )
        if affected:
            cur = self._read_table("simgraph_bands").filter(
                F.col("_bucket").isin(affected)  # partition-pruned read
            )
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh_bands is not None:
                merged = merged.unionByName(fresh_bands)
            self._swap_buckets("simgraph_bands", merged, affected)
        else:
            cur = self._read_table("simgraph_bands")
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh_bands is not None:
                merged = merged.unionByName(fresh_bands)
            self._overwrite("simgraph_bands", merged)
        # pair table: doc-keyed anti-joins on both endpoints (the pair
        # table is unbucketed by design — a pair spans two buckets)
        keys_a = doc_keys.select(F.col("doc_id").alias("doc_a"))
        keys_b = doc_keys.select(F.col("doc_id").alias("doc_b"))
        kept = (
            self._read_table("simgraph_pairs")
            .join(keys_a, "doc_a", "left_anti")
            .join(keys_b, "doc_b", "left_anti")
        )
        if fresh_bands is not None:
            post = self._read_table("simgraph_bands").select(
                "id", "doc_id", "simhash", "band", "band_val"
            )
            fresh_pairs = self._simgraph_incident_pairs(
                fresh_bands.select(
                    "id", "doc_id", "simhash", "band", "band_val"
                ),
                post,
            )
            kept = kept.unionByName(fresh_pairs)
        self._overwrite("simgraph_pairs", kept)

    # -- maintained QUOTIENT layer (r13, VERDICT r12 #6) ----------------
    #
    # The graph family's quotient inputs — exact-collapse classes and
    # class-level (qedge) adjacency — previously rebuilt from scratch
    # whenever the corpus changed (the on-disk fixture index keys on the
    # documents stamp; a rebuild costs 195-650 s at the 100x tiers).
    # These three tables maintain them under doc-keyed DML in O(batch),
    # keyed on the CLASS CONTENT HASH (stable when a class's min-id rep
    # changes under deletes — rep ids are derived at READ time):
    #
    #   quot_members (th, id, doc_id)              flat class membership
    #   quot_bands   (th, simhash, band, band_val) ONE signature per class
    #   quot_qedges  (th_a < th_b, hamming)        verified class adjacency
    #
    # Correctness hinges on the exact_collapse_classes invariant: equal
    # content hash ⇒ equal token array ⇒ equal simhash — so ANY member's
    # text signs the class identically and maintained bands are
    # bit-equal to a rebuild's regardless of arrival order. Arrivals
    # touch only genuinely NEW classes (existing-hash arrivals append a
    # membership row and nothing else — the quotient's whole point);
    # deletes drop emptied classes' bands and incident qedges by hash.

    def build_sim_quotient_index(
        self, max_hamming: int = 3, band_bits: int = 7
    ) -> int:
        """Collapse the current corpus into content classes, sign one
        representative text per class, persist members/bands/verified
        class adjacency. Shares the band layout with
        build_sim_graph_index when that index exists; otherwise
        registers the params itself (the quotient family does not
        require the chunk-level pair table — at paraphrase-dense tiers
        the member pair table is the expensive artifact and the
        quotient can be maintained without it). Returns qedges
        written."""
        from .operators.dedup import SIMHASH_BITS, content_hash

        if self._simgraph_params() is None:
            self.set_metadata(
                "simgraph_params",
                f"{max_hamming},{SIMHASH_BITS},{band_bits}",
            )
        rows = self.chunks(fold_boosts=False).select(
            content_hash(F.col("text")).alias("th"), "id", "doc_id", "text"
        )
        self._overwrite("quot_members", rows.select("th", "id", "doc_id"))
        one_per_class = rows.groupBy("th").agg(F.first("text").alias("text"))
        bands = self._quot_bands_for(one_per_class)
        self._overwrite("quot_bands", bands)
        qedges = self._quot_qedges_from_bands(self._read_table("quot_bands"))
        self._overwrite("quot_qedges", qedges)
        return self._read_table("quot_qedges").count()

    def _quot_bands_for(self, class_texts: DataFrame) -> DataFrame:
        """(th, simhash, band, band_val) for a (th, text) frame — the
        class-level sibling of _simgraph_bands, same registered
        params/layout. Token-free classes produce no row (the has_sig
        filter falls out of the signature aggregate itself)."""
        from .operators.dedup import simhash_band_keys, simhash_signatures

        _mh, bits, band_bits = self._simgraph_params()
        sigs = simhash_signatures(
            class_texts, bits, id_col="th", text_col="text"
        )
        return simhash_band_keys(sigs, bits, band_bits).select(
            F.col("id").alias("th"), "simhash", "band", "band_val"
        )

    def _quot_qedges_from_bands(self, bands: DataFrame) -> DataFrame:
        """Verified (th_a < th_b, hamming) class adjacency from the band
        table — same band-equi-join + bit_count(xor) verify as the
        member-level family."""
        mh, _bits, _bb = self._simgraph_params()
        a = bands.select(
            F.col("th").alias("th_a"), F.col("simhash").alias("sa"),
            "band", "band_val",
        )
        b = bands.select(
            F.col("th").alias("th_b"), F.col("simhash").alias("sb"),
            "band", "band_val",
        )
        return (
            a.join(b, ["band", "band_val"])
            .filter(F.col("th_a") < F.col("th_b"))
            .select("th_a", "th_b", "sa", "sb")
            .distinct()
            .withColumn("hamming", F.bit_count(F.expr("sa ^ sb")).cast("long"))
            .filter(F.col("hamming") <= mh)
            .select("th_a", "th_b", "hamming")
        )

    def _quot_incident_qedges(
        self, new_bands: DataFrame, all_bands: DataFrame
    ) -> DataFrame:
        """Class qedges incident to a batch of NEW classes, one-sided —
        the _simgraph_incident_pairs idiom at class granularity.
        `all_bands` must include `new_bands` (within-batch adjacency)."""
        mh, _bits, _bb = self._simgraph_params()
        q = new_bands.select(
            F.col("th").alias("qth"), F.col("simhash").alias("qsig"),
            "band", "band_val",
        )
        cand = (
            all_bands.join(q, ["band", "band_val"])
            .filter(F.col("th") != F.col("qth"))
            .select(
                F.least("th", "qth").alias("th_a"),
                F.greatest("th", "qth").alias("th_b"),
                F.when(F.col("th") < F.col("qth"), F.col("simhash"))
                .otherwise(F.col("qsig")).alias("sa"),
                F.when(F.col("th") < F.col("qth"), F.col("qsig"))
                .otherwise(F.col("simhash")).alias("sb"),
            )
            .distinct()
        )
        return (
            cand.withColumn(
                "hamming", F.bit_count(F.expr("sa ^ sb")).cast("long")
            )
            .filter(F.col("hamming") <= mh)
            .select("th_a", "th_b", "hamming")
        )

    def sim_quotient_index(self):
        """(classes, qedges) in exactly the shape the quotient graph
        family consumes — classes (rep, members, m) over chunk ids,
        qedges (id_a < id_b) on rep ids — or None when the index was
        never built. Rep ids are DERIVED here (min member id per class,
        one columnar agg over the flat membership table): the stored
        tables key on content hash precisely so rep churn under deletes
        never rewrites adjacency."""
        if self._simgraph_params() is None or not self._exists(
            "quot_members"
        ):
            return None
        members = self._read_table("quot_members")
        cls = members.groupBy("th").agg(
            F.min("id").alias("rep"),
            F.array_sort(F.collect_list("id")).alias("members"),
            F.count(F.lit(1)).cast("long").alias("m"),
        )
        # has_sig filter (the graph family's ADVICE-r11 contract: a
        # token-free class is ISOLATED, never an internal clique) —
        # a class has a signature iff it has a band row
        sig = self._read_table("quot_bands").select("th").distinct()
        cls = cls.join(sig, "th", "left_semi")
        reps = cls.select("th", "rep")
        qe = self._read_table("quot_qedges")
        qedges = (
            qe.join(reps.withColumnRenamed("th", "th_a"), "th_a")
            .withColumnRenamed("rep", "rep_a")
            .join(
                reps.select(
                    F.col("th").alias("th_b"), F.col("rep").alias("rep_b")
                ),
                "th_b",
            )
            .select(
                F.least("rep_a", "rep_b").alias("id_a"),
                F.greatest("rep_a", "rep_b").alias("id_b"),
            )
        )
        return cls.select("rep", "members", "m"), qedges

    def _quot_append(self, chunk_rows: DataFrame) -> None:
        """O(batch) arrival maintenance: membership rows always append;
        only hashes UNSEEN by the class table sign + band-join against
        the maintained class bands (batch × bucket candidates — an
        arrival that exact-duplicates an existing class touches no
        adjacency at all, the quotient's core saving)."""
        from .operators.dedup import content_hash

        if self._simgraph_params() is None or not self._exists(
            "quot_members"
        ):
            return
        rows = chunk_rows.select(
            content_hash(F.col("text")).alias("th"), "id", "doc_id", "text"
        ).localCheckpoint(eager=True)
        existing = self._read_table("quot_members").select("th").distinct()
        new_classes = (
            rows.groupBy("th")
            .agg(F.first("text").alias("text"))
            .join(existing, "th", "left_anti")
        )
        new_bands = self._quot_bands_for(new_classes).localCheckpoint(
            eager=True
        )
        all_bands = (
            self._read_table("quot_bands")
            .select("th", "simhash", "band", "band_val")
            .unionByName(new_bands)
        )
        fresh = self._quot_incident_qedges(new_bands, all_bands)
        self._append_bucketed("quot_members", rows.select("th", "id", "doc_id"), False)
        self._append_bucketed("quot_bands", new_bands, False)
        self._append_bucketed("quot_qedges", fresh, False)

    def _quot_replace_docs(
        self, doc_keys, new_rows: DataFrame | None
    ) -> None:
        """Doc-level MERGE/DELETE maintenance: drop the docs' membership
        rows; classes left EMPTY drop their band rows and incident
        qedges (hash-keyed anti-joins); new versions arrive through the
        same incident plan as _quot_append."""
        from .operators.dedup import content_hash

        if self._simgraph_params() is None or not self._exists(
            "quot_members"
        ):
            return
        members = self._read_table("quot_members")
        kept_members = members.join(doc_keys, "doc_id", "left_anti")
        # hashes that still have a member after the delete
        alive = kept_members.select("th").distinct()
        dead = (
            members.select("th").distinct().join(alive, "th", "left_anti")
            .localCheckpoint(eager=True)
        )
        kept_bands = self._read_table("quot_bands").join(
            dead, "th", "left_anti"
        )
        dead_a = dead.select(F.col("th").alias("th_a"))
        dead_b = dead.select(F.col("th").alias("th_b"))
        kept_qedges = (
            self._read_table("quot_qedges")
            .join(dead_a, "th_a", "left_anti")
            .join(dead_b, "th_b", "left_anti")
        )
        if new_rows is None:
            self._overwrite("quot_members", kept_members)
            self._overwrite("quot_bands", kept_bands)
            self._overwrite("quot_qedges", kept_qedges)
            return
        rows = new_rows.select(
            content_hash(F.col("text")).alias("th"), "id", "doc_id", "text"
        ).localCheckpoint(eager=True)
        surviving = kept_members.select("th").distinct()
        new_classes = (
            rows.groupBy("th")
            .agg(F.first("text").alias("text"))
            .join(surviving, "th", "left_anti")
        )
        new_bands = self._quot_bands_for(new_classes).localCheckpoint(
            eager=True
        )
        all_bands = kept_bands.select(
            "th", "simhash", "band", "band_val"
        ).unionByName(new_bands)
        # eager: `fresh` reads the CURRENT quot_bands files; the
        # overwrite below replaces them, so a lazy plan evaluated at
        # quot_qedges-write time would chase deleted parquet parts
        fresh = self._quot_incident_qedges(
            new_bands, all_bands
        ).localCheckpoint(eager=True)
        self._overwrite(
            "quot_members",
            kept_members.unionByName(rows.select("th", "id", "doc_id")),
        )
        self._overwrite("quot_bands", kept_bands.unionByName(new_bands))
        self._overwrite("quot_qedges", kept_qedges.unionByName(fresh))

    def ivf_candidates(
        self, query_vec, n_probe: int | None = None
    ) -> DataFrame | None:
        """Candidate chunk ids from the n_probe centroids nearest the
        query (driver-side argmax over k tiny centroids, then ONE
        filtered scan of the assignment table — no corpus scan).
        ``n_probe=None`` probes ceil(IVF_PROBE_FRAC * n_centroids) —
        the measured-recall fraction ivf_auto_params documents."""
        idx = self.ivf_index()
        if idx is None:
            return None
        assignments, cents, _dim, _k = idx
        import math

        if n_probe is None:
            from .operators.similarity import IVF_PROBE_FRAC

            # the canonical probe fraction (shared constant with
            # ivf_auto_params) so serving and index sizing cannot drift
            n_probe = min(
                len(cents), max(1, math.ceil(IVF_PROBE_FRAC * len(cents)))
            )

        q = list(query_vec)
        qn = math.sqrt(sum(x * x for x in q)) or 1.0

        def cos(v):
            vn = math.sqrt(sum(x * x for x in v)) or 1.0
            return sum(a * b for a, b in zip(q, v)) / (qn * vn)

        probes = [
            cid
            for cid, _ in sorted(
                ((cid, cos(v)) for cid, v in cents), key=lambda t: (-t[1], t[0])
            )[: int(n_probe)]
        ]
        return assignments.filter(F.col("centroid_id").isin(probes)).select("id")

    # -- Continuous aggregate: per-doc rollup (mergeable partials) --------
    #
    # The hypertable-rollup analog: a per-document aggregate table kept
    # fresh THROUGH DML instead of recomputed by corpus scans. The design
    # reuses the workspace's two existing maintenance idioms:
    #   * appends land mergeable PARTIAL aggregate rows (the boosts-delta
    #     pattern — one tiny groupBy of the batch, never a corpus read);
    #   * doc-level MERGE/DELETE drops the touched docs' partials and
    #     inserts fresh ones through the same bucket-scoped swap as the
    #     chunk table (the ANN-index pattern).
    # Reads fold partials with one groupBy(doc_id); every aggregate is
    # algebraic (sum/min/max) so folding partials == recomputing from
    # the chunk table, which the test suite asserts after DML sequences.

    def enable_doc_rollup(self) -> None:
        """Create (or rebuild) the rollup from the current chunk table
        and turn on maintenance for all subsequent DML."""
        self.set_metadata("doc_rollup", "1")
        self._fs.rmtree(self._tbl("doc_rollup"))
        if not self._exists("chunks"):
            return
        partials = self._rollup_partials(
            self._read_table("chunks")
        )
        self._overwrite("doc_rollup", partials)

    def _rollup_enabled(self) -> bool:
        return self.get_metadata("doc_rollup") == "1"

    def _rollup_partials(self, chunk_rows: DataFrame) -> DataFrame:
        """One partial row per doc (per bucket when partitioned) for a
        batch: algebraic aggregates only, so partials merge exactly."""
        keys = (
            ["doc_id", "_bucket"]
            if "_bucket" in chunk_rows.columns
            else ["doc_id"]
        )
        return chunk_rows.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.sum(
                F.when(F.col("chunk_type") == "code", 1).otherwise(0)
            ).cast("long").alias("n_code_chunks"),
            F.max("chunk_idx").cast("long").alias("max_chunk_idx"),
            F.min("created_at").alias("first_created_at"),
            F.max("created_at").alias("last_created_at"),
        )

    def _rollup_append(self, chunk_rows: DataFrame) -> None:
        """Rollup maintenance for a pure append: aggregate the batch,
        append the partials. O(batch), no corpus read."""
        if not self._rollup_enabled():
            return
        partials = self._rollup_partials(chunk_rows)
        self._append_bucketed("doc_rollup", partials, "_bucket" in partials.columns)

    def _rollup_replace_docs(
        self,
        doc_keys,
        new_rows: DataFrame | None,
        affected: list[int] | None,
    ) -> None:
        """Rollup maintenance for doc-level MERGE/DELETE: drop the touched
        docs' partials (doc-keyed anti-join), insert fresh ones;
        bucket-scoped swap when partitioned (`affected` = the same bucket
        set the chunk rewrite touched)."""
        if not self._rollup_enabled() or not self._exists("doc_rollup"):
            return
        fresh = self._rollup_partials(new_rows) if new_rows is not None else None
        if affected:
            cur = self._read_table("doc_rollup").filter(
                F.col("_bucket").isin(affected)  # partition-pruned read
            )
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh is not None:
                merged = merged.unionByName(fresh)
            self._swap_buckets("doc_rollup", merged, affected)
        else:
            cur = self._read_table("doc_rollup")
            merged = cur.join(doc_keys, "doc_id", "left_anti")
            if fresh is not None:
                merged = merged.unionByName(fresh)
            self._overwrite("doc_rollup", merged)

    def doc_rollup(self) -> DataFrame:
        """Folded per-doc aggregates. ONE groupBy over the partial table
        (rollup-sized, not corpus-sized); equal to recomputing from the
        chunk table by construction — asserted in tests."""
        if not self._rollup_enabled() or not self._exists("doc_rollup"):
            raise ValueError(
                "doc rollup not enabled — call enable_doc_rollup() first"
            )
        return (
            self._read_table("doc_rollup")
            .groupBy("doc_id")
            .agg(
                F.sum("n_chunks").cast("long").alias("n_chunks"),
                F.sum("total_chars").cast("long").alias("total_chars"),
                F.sum("n_code_chunks").cast("long").alias("n_code_chunks"),
                F.max("max_chunk_idx").cast("long").alias("max_chunk_idx"),
                F.min("first_created_at").alias("first_created_at"),
                F.max("last_created_at").alias("last_created_at"),
            )
        )

    def compact_rollup(self) -> None:
        """Fold accumulated partials into one row per doc (value-
        preserving housekeeping, same role as compact_boosts). Bucketed:
        rewrites every bucket but through the versioned swap, so a crash
        never loses partials."""
        if not self._rollup_enabled() or not self._exists("doc_rollup"):
            return
        cur = self._read_table("doc_rollup")
        keys = ["doc_id"] + (["_bucket"] if "_bucket" in cur.columns else [])
        folded = cur.groupBy(*keys).agg(
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("total_chars").cast("long").alias("total_chars"),
            F.sum("n_code_chunks").cast("long").alias("n_code_chunks"),
            F.max("max_chunk_idx").cast("long").alias("max_chunk_idx"),
            F.min("first_created_at").alias("first_created_at"),
            F.max("last_created_at").alias("last_created_at"),
        )
        if "_bucket" in cur.columns:
            buckets = sorted(
                r["_bucket"] for r in cur.select("_bucket").distinct().collect()
            )
            self._swap_buckets("doc_rollup", folded, buckets)
        else:
            self._overwrite("doc_rollup", folded)

    @_logged
    def optimize(self, max_files_per_bucket: int = 4) -> dict:
        """Small-file compaction (Delta OPTIMIZE analog). Streaming
        upserts and per-doc merges each land at least one parquet file
        per touched bucket; after N micro-batches a bucket holds N small
        files and every scan pays N footer reads + N row-group seeks.
        At 100 TB that is the classic small-file death — compaction is
        mandatory housekeeping, not a nicety.

        Rewrites ONLY buckets whose file count exceeds
        `max_files_per_bucket`, one output file per bucket, through the
        same two-phase versioned swap as DML — untouched buckets keep
        their files byte-identical. Boost deltas are NOT folded (that is
        `compact_boosts`' job); row content is preserved exactly.

        The maintained index tables (`ann_lsh`, `ann_ivf`) accumulate
        small files through the same DML (one file per touched bucket
        per micro-batch), so they compact here too — clustered by their
        own probe keys ((table, bucket) for LSH, centroid_id for IVF) so
        index probes row-group-prune. The doc rollup has its own
        value-folding compaction (`compact_rollup`).

        Returns {"buckets_compacted": [...], "files_before": n,
        "files_after": m, "index_tables": {name: {...}}}.
        """
        if not self._exists("chunks"):
            return {"buckets_compacted": [], "files_before": 0, "files_after": 0}

        def _files(d: str) -> list[str]:
            return [
                f
                for f in self._fs.listdir(d)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]

        index_results = {}
        for iname, sort_cols in (
            ("ann_lsh", ["table", "bucket"]),
            ("ann_ivf", ["centroid_id"]),
            ("fts", ["token"]),
        ):
            if not self._exists(iname):
                continue
            iroot = self._tbl(iname)
            per = self._bucket_parquet_counts(iname)
            if per is not None:
                hit = sorted(
                    k for k, n in per.items() if n > max_files_per_bucket
                )
                if hit:
                    df = (
                        self._read_table(iname)
                        .filter(F.col("_bucket").isin(hit))
                        .repartition(len(hit), "_bucket")
                        .sortWithinPartitions("_bucket", *sort_cols)
                    )
                    self._swap_buckets(iname, df, hit)
                index_results[iname] = {
                    "buckets_compacted": hit,
                    "files_before": sum(per.values()),
                }
            else:
                n_before = len(_files(iroot))
                if n_before > max_files_per_bucket:
                    self._overwrite(
                        iname,
                        self._read_table(iname)
                        .coalesce(1)
                        .sortWithinPartitions(*sort_cols),
                    )
                index_results[iname] = {
                    "buckets_compacted": [-1] if n_before > max_files_per_bucket else [],
                    "files_before": n_before,
                }

        root = self._tbl("chunks")
        b = int(self.get_metadata("partition_buckets") or 0)
        if not b:
            # unbucketed: compact the whole table to one file when over cap
            n_before = len(_files(root))
            if n_before <= max_files_per_bucket:
                return {"buckets_compacted": [], "files_before": n_before,
                        "files_after": n_before, "index_tables": index_results}
            self._overwrite("chunks", self.chunks(fold_boosts=False).coalesce(1))
            return {"buckets_compacted": [-1], "files_before": n_before,
                    "files_after": len(_files(root)),
                    "index_tables": index_results}

        per_bucket = self._bucket_parquet_counts("chunks") or {}
        affected = sorted(k for k, n in per_bucket.items() if n > max_files_per_bucket)
        files_before = sum(per_bucket.values())
        if not affected:
            return {"buckets_compacted": [], "files_before": files_before,
                    "files_after": files_before, "index_tables": index_results}

        compacted = (
            self.chunks(fold_boosts=False)
            .filter(F.col("_bucket").isin(affected))  # partition-pruned read
            .repartition(len(affected), "_bucket")    # exactly 1 file/bucket
            # cluster rows by (doc_id, chunk_idx) inside each compacted
            # file: parquet min/max stats then row-group-prune doc point
            # reads (chunks_for_doc) instead of scanning the whole
            # bucket — the Z-ORDER-lite a single sort key buys
            .sortWithinPartitions("_bucket", "doc_id", "chunk_idx")
        )
        self._swap_buckets("chunks", compacted, affected)
        files_after = sum((self._bucket_parquet_counts("chunks") or {}).values())
        return {"buckets_compacted": affected, "files_before": files_before,
                "files_after": files_after, "index_tables": index_results}

    @_logged
    def vacuum(self) -> dict:
        """Delta-VACUUM analog for the versioned-swap protocol: every
        write leaves `_<table>_tmp` / `_<table>_old*` directories only
        when it crashed mid-swap (clean runs delete them). Vacuum removes
        those leftovers once the live tables are confirmed readable —
        reclaiming space without ever touching a live table directory.
        Returns {removed: [names], kept: [names]} where kept = leftovers
        that are crash-recovery material, so vacuum refuses: the live
        table is missing entirely, OR (bucket-aware) the leftover holds
        a bucket whose live directory is gone — mid-swap crash, the
        parked/tmp copy is the ONLY copy; recover() restores it.

        Manifest-protocol garbage: segments not named by a table's
        pointer file are committed-over versions or crashed-install
        leftovers — the pointer is the single source of truth and its
        write was atomic, so they are unconditionally reclaimable; same
        for `_<table>_stage` staging dirs once a manifest exists."""
        removed, kept = [], []
        for entry in sorted(self._fs.listdir(self.path)):
            path = f"{self.path}/{entry}"
            if not (entry.startswith("_") and self._fs.isdir(path)):
                continue
            base = None
            if entry.endswith("_stage"):
                # manifest staging leftover (clean installs delete it):
                # committed data was MOVED out, so remaining content is
                # garbage — but only once the table's pointer exists (a
                # crashed FIRST append has no manifest; keep the stage
                # as evidence for the operator)
                if self._manifest(entry[1:-6]) is not None:
                    self._fs.rmtree(path)
                    removed.append(entry)
                else:
                    kept.append(entry)
                continue
            if entry.endswith("_tmp"):
                base = entry[1:-4]
            elif "_old" in entry:
                base = entry[1 : entry.index("_old")]
            if base is None:
                continue
            if not self._fs.isdir(self._tbl(base)):
                kept.append(entry)  # live table gone: leftover IS the data
                continue
            # bucket-aware safety: a parked old-bucket copy (or a tmp
            # holding a bucket) whose LIVE bucket directory is missing is
            # the only copy of that bucket — crash-recovery material for
            # recover(), never garbage
            if "_old_bucket_" in entry:
                k = entry.rsplit("_old_bucket_", 1)[1]
                if not self._fs.isdir(f"{self._tbl(base)}/_bucket={k}"):
                    kept.append(entry)
                    continue
            if entry.endswith("_tmp"):
                missing = [
                    d
                    for d in self._fs.listdir(path)
                    if d.startswith("_bucket=")
                    and not self._fs.isdir(f"{self._tbl(base)}/{d}")
                ]
                if missing:
                    kept.append(entry)
                    continue
            self._fs.rmtree(path)
            removed.append(entry)
        # manifest-managed tables: reclaim segments the pointer no
        # longer names (displaced versions whose post-commit delete
        # crashed, or installs whose pointer write never happened)
        for entry in sorted(self._fs.listdir(self.path)):
            if entry.startswith(("_", ".")):
                continue
            m = self._manifest(entry)
            if m is None:
                continue
            troot = self._tbl(entry)
            for d in self._fs.listdir(troot):
                if not d.startswith("_bucket="):
                    continue
                live = set(m["buckets"].get(d.split("=", 1)[1], []))
                for seg in self._fs.listdir(f"{troot}/{d}"):
                    if seg.startswith("seg-") and seg not in live:
                        self._fs.rmtree(f"{troot}/{d}/{seg}")
                        removed.append(f"{entry}/{d}/{seg}")
        return {"removed": removed, "kept": kept}

    def _log_history(self, op: str) -> None:
        from datetime import datetime, timezone

        version = 0
        if self._exists("_history"):
            version = self.spark.read.parquet(self._tbl("_history")).count()
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        self.spark.createDataFrame(
            [(version, now, op)], "version long, ts timestamp, op string"
        ).coalesce(1).write.mode("append").parquet(self._tbl("_history"))

    def mutation_stamp(self) -> tuple[int, int, int]:
        """Cheap corpus-version token: (number of `_history` parquet
        files, newest `_history` file mtime in ns, total `_history`
        bytes). One filesystem listing, no Spark job — callers key
        derived caches on equality so DML from ANY writer (streaming
        upsert, CLI, a second engine over the same path) invalidates
        them. A bare file COUNT is not monotone under a future _history
        compaction/vacuum (it could return to a previously cached value
        — ADVICE r7); mtime narrows that but HDFS mtimes are
        millisecond-granular, so a count-preserving rewrite within one
        millisecond could still alias — the byte total closes that
        (ADVICE r8): any rewrite that changes content changes at least
        one of the three. All three components come from ONE directory
        listing (ADVICE r9): a second listdir for the count both
        doubled the RPC and could interleave with a concurrent writer,
        yielding a stamp matching neither the before nor after state."""
        return self._fs.dir_stamp(self._tbl("_history"))

    def history(self) -> DataFrame:
        """Mutation log, newest first (DESCRIBE HISTORY analog).
        Survives clear(): a cleared workspace keeps its audit trail."""
        if not self._exists("_history"):
            return self.spark.createDataFrame(
                [], "version long, ts timestamp, op string"
            )
        return self.spark.read.parquet(self._tbl("_history")).orderBy(
            F.col("version").desc()
        )

    def _overwrite(self, name: str, df: DataFrame) -> None:
        """Versioned-directory swap: write tmp → move current aside →
        move tmp in → drop the old version. The table data is never
        deleted before its replacement exists, so the worst crash leaves
        either the old version in place or both `_old` and the final dir
        on disk (recoverable) — never an empty workspace. (True
        multi-reader atomicity needs the Delta path; see module doc.)

        Manifest protocol + bucketed data: full-table pointer commit
        (every bucket repointed at the fresh segment atomically).
        Unbucketed side tables (metadata KV, centroids) stay on the
        rename path even in manifest workspaces — they are tiny, and
        their rename cost on an object store is one small copy."""
        if self._protocol == "manifest" and "_bucket" in df.columns:
            self._manifest_install(name, df, replace="all")
            return
        tmp = self._tbl(f"_{name}_tmp")
        old = self._tbl(f"_{name}_old")
        self._fs.rmtree(old)  # leftover from a crash
        writer = df.write.mode("overwrite")
        if "_bucket" in df.columns:
            # preserve the hash-bucket directory layout through updates —
            # a flat rewrite would silently demote _bucket to a data
            # column and lose partition pruning
            writer = writer.partitionBy("_bucket")
        writer.parquet(tmp)
        final = self._tbl(name)
        if self._fs.isdir(final):
            self._fs.rename(final, old)
        self._fs.rename(tmp, final)
        self._fs.rmtree(old)

    # -- S7: interaction feedback (exploration quarantine) ----------------
    def add_interaction(
        self,
        query: str,
        chunk_id: int,
        was_exploration: bool,
        asof,
        doc_id: str | None = None,
    ) -> None:
        """`vector_store.cpp:797-811`: log a USER_CLICK row; boost +0.1
        only when NOT an exploration probe."""
        self.log_retrieval(
            query=f"USER_CLICK: {query}", semantic_rank=chunk_id, keyword_rank=0,
            final_rank=0, top_score=0.0, mmr_penalty=0.0,
            is_exploration=1 if was_exploration else 0, rank_delta=0,
            stability=0.0, created_at=asof,
        )
        if not was_exploration:
            self.boost_entry(chunk_id, 0.1, doc_id=doc_id)

    # -- S8: retrieval log append -----------------------------------------
    def log_retrieval(self, **kw) -> None:
        created = kw.get("created_at")
        if isinstance(created, str):
            from datetime import datetime

            created = datetime.fromisoformat(created)
            kw["created_at"] = created
        row = (
            kw.get("query", ""), kw.get("semantic_rank", 0), kw.get("keyword_rank", 0),
            kw.get("final_rank", 0), kw.get("latency_embedding", 0),
            kw.get("latency_search", 0), kw.get("latency_fusion", 0),
            kw.get("latency_rerank", 0), kw.get("top_score", 0.0),
            kw.get("mmr_penalty", 0.0), kw.get("is_exploration", 0),
            kw.get("rank_delta", 0), kw.get("stability", 0.0),
            kw.get("mmr_decay", 1.0), kw.get("created_at"),
        )
        self.spark.createDataFrame([row], LOG_SCHEMA).write.mode("append").parquet(
            self._tbl("retrieval_logs")
        )

    def retrieval_logs(self) -> DataFrame | None:
        if not self._exists("retrieval_logs"):
            return None
        # v15 migration analog (`vector_store.cpp:144-148` ALTER ... DEFAULT
        # 1.0): logs appended by a pre-v15 engine lack mmr_decay. Reading
        # with the EXPLICIT v15 schema null-fills the column for old files
        # at scan time — no mergeSchema footer pass over every log
        # part-file per read (engine.search hits this once per uncached
        # query; footer merging grows with log volume — ADVICE r7).
        df = self.spark.read.schema(LOG_SCHEMA).parquet(
            self._tbl("retrieval_logs")
        )
        return df.fillna({"mmr_decay": 1.0})

    # -- S9: metadata KV --------------------------------------------------
    def set_metadata(self, key: str, value: str) -> None:
        cur = self._metadata()
        cur[key] = value
        self._write_metadata(cur)

    def get_metadata(self, key: str) -> str | None:
        return self._metadata().get(key)

    def delete_metadata(self, key: str) -> None:
        cur = self._metadata()
        if key in cur:
            del cur[key]
            self._write_metadata(cur)

    def _metadata(self) -> dict[str, str]:
        if not self._exists("workspace_metadata"):
            return {}
        return {
            r["key"]: r["value"]
            for r in self.spark.read.parquet(self._tbl("workspace_metadata")).collect()
        }

    def _write_metadata(self, kv: dict[str, str]) -> None:
        df = self.spark.createDataFrame(
            list(kv.items()) or [("", "")], "key string, value string"
        )
        if not kv:
            df = df.limit(0)
        self._overwrite("workspace_metadata", df)

    # -- snapshots: zero-copy SHALLOW CLONE + RESTORE analog --------------
    def snapshot(self, tag: str) -> dict:
        """Zero-copy point-in-time snapshot of every live table into
        `_snapshots/<tag>/` (Delta SHALLOW CLONE analog): on local
        filesystems the data files are HARDLINKED, not copied — O(files)
        metadata ops regardless of table size — which is safe because
        every DML writes NEW files and swaps directories (bytes are
        never rewritten in place), so a later mutation unlinks the live
        name while the snapshot keeps the inode. URI workspaces fall
        back to a filesystem-side copy. Refuses over unrecovered crash
        leftovers (the parked dir is data, not state to snapshot)."""
        if not re.fullmatch(r"[A-Za-z0-9._-]+", tag):
            raise ValueError(f"bad snapshot tag {tag!r}")
        for entry in self._list_root():
            if "_old_bucket_" in entry and entry.startswith("_"):
                base = entry[1 : entry.index("_old_bucket_")]
                self._ensure_recovered(base)
        dst = self._tbl(f"_snapshots/{tag}")
        if self._fs.isdir(dst):
            raise ValueError(f"snapshot {tag!r} already exists")
        tables = [
            e
            for e in self._list_root()
            if not e.startswith("_snapshots")
            and not e.endswith("_tmp")
            and "_old" not in e
            and self._fs.isdir(self._tbl(e))
        ]
        # log BEFORE copying so the snapshot carries the record of its
        # own creation (and a later restore still shows it). Worst crash
        # mid-copy leaves one benign history row + a partial _snapshots
        # dir that drop_snapshot removes — live tables are never touched.
        self._log_history(f"snapshot:{tag}")
        for t in tables:
            self._fs.copytree(self._tbl(t), f"{dst}/{t}")
        return {"tag": tag, "tables": sorted(tables)}

    @_logged
    def restore(self, tag: str) -> dict:
        """Roll every table back to the snapshot's state (Delta RESTORE
        analog): two-phase per table — link the snapshot content to a
        `_tmp` dir, swap it in via the same rename protocol as
        `_overwrite` (worst crash leaves old or both copies, never
        neither) — and DROP tables created after the snapshot. The
        snapshot itself is untouched (restore again anytime); a new
        `restore` history row lands on top of the restored history."""
        src = self._tbl(f"_snapshots/{tag}")
        if not self._fs.isdir(src):
            raise ValueError(f"no snapshot {tag!r}")
        snap_tables = set(self._fs.listdir(src))
        live = [
            e
            for e in self._list_root()
            if not e.startswith("_snapshots")
            and not e.endswith("_tmp")
            and "_old" not in e
            and self._fs.isdir(self._tbl(e))
        ]
        dropped = sorted(set(live) - snap_tables)
        for t in sorted(snap_tables):
            tmp, old = self._tbl(f"_{t}_tmp"), self._tbl(f"_{t}_old")
            self._fs.rmtree(tmp)
            self._fs.rmtree(old)
            self._fs.copytree(f"{src}/{t}", tmp)
            if self._fs.isdir(self._tbl(t)):
                self._fs.rename(self._tbl(t), old)
            self._fs.rename(tmp, self._tbl(t))
            self._fs.rmtree(old)
        for t in dropped:
            self._fs.rmtree(self._tbl(t))
        return {"tag": tag, "restored": sorted(snap_tables), "dropped": dropped}

    def list_snapshots(self) -> list[str]:
        return sorted(self._fs.listdir(self._tbl("_snapshots")))

    def drop_snapshot(self, tag: str) -> None:
        self._fs.rmtree(self._tbl(f"_snapshots/{tag}"))

    def snapshot_diff(self, tag_a: str, tag_b: str | None = None) -> DataFrame:
        """Chunk-level corpus delta between snapshot `tag_a` and
        `tag_b` (or the LIVE chunk table when tag_b is None) — the
        data-versioning primitive an incremental pipeline keys on:
        which chunks must be re-embedded / re-deduped / re-indexed
        since the last corpus version, without a full recompute.

        Output: (id, doc_id, status) with status ∈ added (in b only),
        removed (in a only), changed (same id, different text content —
        compared by md5, never by shipping both text payloads through
        the join).

        Scale shape: two parquet scans projected to (id, doc_id,
        md5(text)) — column-pruned, a few bytes/row regardless of chunk
        size — and ONE id-keyed full-outer join; no corpus-wide sort,
        no driver state. Unchanged rows are filtered before the
        result ever materializes."""

        def side(df):
            return df.select(
                F.col("id"), F.col("doc_id"), F.md5(F.col("text")).alias("h")
            )

        a = side(self._read_snapshot_chunks(tag_a)).alias("a")
        b = side(
            self._read_snapshot_chunks(tag_b) if tag_b is not None
            else self._read_table("chunks")
        ).alias("b")
        j = a.join(b, F.col("a.id") == F.col("b.id"), "full_outer")
        return (
            j.select(
                F.coalesce(F.col("a.id"), F.col("b.id")).alias("id"),
                F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
                F.when(F.col("a.id").isNull(), F.lit("added"))
                .when(F.col("b.id").isNull(), F.lit("removed"))
                # null-SAFE comparison: md5(NULL) is NULL, and a plain
                # != against NULL yields SQL NULL — a text change to or
                # from NULL would silently read as "unchanged"
                .when(
                    ~F.col("a.h").eqNullSafe(F.col("b.h")), F.lit("changed")
                )
                .alias("status"),
            )
            .filter(F.col("status").isNotNull())
        )

    def _read_snapshot_chunks(self, tag: str) -> DataFrame:
        src = f"_snapshots/{tag}/chunks"
        if not self._fs.isdir(self._tbl(src)):
            raise ValueError(f"no snapshot {tag!r} (or it has no chunks table)")
        # _read_table is path-relative, so it resolves the snapshot's own
        # manifest for bucketed tables (the snapshot copies it verbatim)
        # and falls back to directory discovery for rename-managed ones
        return self._read_table(src)

    # -- S2: CSV export ---------------------------------------------------
    def export_csv(self, out_path: str) -> None:
        """(id, source_file, text) with full quoting
        (`vector_store.cpp:657-671`)."""
        (
            self.chunks()
            .select("id", "source_file", "text")
            .write.mode("overwrite")
            .option("quoteAll", True)
            .option("header", True)
            .csv(out_path)
        )

    def export_jsonl(self, out_path: str, with_embeddings: bool = False) -> None:
        """JSONL export — the interchange format LLM-data pipelines
        actually pass around (one JSON object per line; Spark's json
        sink IS JSONL). Mirrors export_csv's column contract; pass
        with_embeddings=True to carry the vectors (floats serialize as
        JSON arrays). Round-trips through sources/textfiles.read_jsonl
        and any jq/pandas consumer."""
        cols = ["id", "doc_id", "source_file", "text"] + (
            ["embedding"] if with_embeddings else []
        )
        self.chunks().select(*cols).write.mode("overwrite").json(out_path)

    def export_orc(self, out_path: str, with_embeddings: bool = True) -> None:
        """ORC export — the columnar interchange for Hive/Trino/Presto
        consumers (ORC support is built into Spark, no external
        package). Same column contract as export_jsonl; embeddings
        carry as ORC list<float> columns."""
        cols = ["id", "doc_id", "source_file", "text"] + (
            ["embedding"] if with_embeddings else []
        )
        self.chunks().select(*cols).write.mode("overwrite").orc(out_path)


def list_workspaces(root: str) -> list[str]:
    """Workspace enumeration (`mainwindow.cpp:936-952` globs *.sqlite;
    here: subdirectories containing a chunks table)."""
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d, "chunks"))
    )
