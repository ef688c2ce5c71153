"""PvdbEngine — the user-facing facade mirroring the reference's full
lifecycle (SURVEY §3): index → search → deep-dive → feedback.

A user of the reference app drives it through three entry points
(`mainwindow.cpp`): "Select PDF" (index), "Search" (hybrid retrieval with
optional rerank/MMR/exploration), "Deep Dive Synthesis" (clustered cited
claims) — plus click feedback. This class exposes the same surface over
a Parquet workspace, wiring together every operator family with the
session-state components (latency governor, query cache, MMR entropy
EMA, rerank calibrator).

All model touchpoints (embed/rerank/synthesize) default to the
deterministic local stubs; pass real providers via the same interfaces.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions.embed import hash_embed, make_embed_udf
from .operators import fusion, intent as intent_mod, mmr as mmr_mod
from .operators.context import source_context
from .operators.rerank import Calibrator, rerank_rows
from .operators.synthesis import SourceContext, synthesize
from .plans.hybrid import hybrid_search
from .serving import LatencyGovernor, QueryCache
from .sinks import Workspace


class PvdbEngine:
    def __init__(
        self,
        spark: SparkSession,
        workspace_path: str,
        dim: int = 64,
        embedder=None,
        embed_udf=None,
        asof: str | None = None,
        ivf_n_probe: int | None = None,
    ):
        """`embedder`: text→vector for query-side embedding (driver,
        one call per search). `embed_udf`: a pandas UDF column function
        for BULK indexing (e.g. providers.make_http_embed_udf — one POST
        per Arrow batch); defaults to the deterministic hash stub. Both
        must produce the same space, as in the reference where one
        configured model serves both sides. `ivf_n_probe`: cells probed
        by IVF-backed serving — the recall/latency knob (raise toward
        the centroid count for exact coverage; None auto-sizes to
        ceil(0.375 * centroid count), the measured-recall fraction
        similarity.ivf_auto_params documents)."""
        self.spark = spark
        self.workspace = Workspace(spark, workspace_path)
        self.dim = dim
        self.ivf_n_probe = None if ivf_n_probe is None else int(ivf_n_probe)
        self.embed_text = embedder or (lambda t: hash_embed(t, dim))
        self.embed_udf = embed_udf
        self.governor = LatencyGovernor()
        self.cache = QueryCache()
        self._corpus_hint: dict | None = None  # rollup-backed, per corpus version
        self.mmr_state = mmr_mod.MmrState()
        # calibration state survives sessions via workspace metadata
        # (reference persists on close and reloads on open,
        # `mainwindow.cpp:499-503`); a fresh workspace yields defaults
        self.calibrator = Calibrator.from_kv("rerank", self.workspace._metadata())
        self.asof = asof or datetime.now(timezone.utc).isoformat(sep=" ", timespec="seconds").replace("+00:00", "")

    # -- indexing (SURVEY §3.1) ------------------------------------------
    def index_documents(
        self,
        docs: DataFrame,
        source_file: str = "batch",
        upsert: bool = False,
        doc_col: str | None = None,
        chunk_idx_col: str | None = None,
    ) -> int:
        """Index pre-chunked documents (doc_id, text): tiny-chunk filter
        (I14) → batched embed UDF (I16) → workspace append with dim
        guardrail (I17/S1). Returns rows indexed.

        doc_col: optional column naming the SOURCE DOCUMENT each chunk
        belongs to. Without it every chunk is its own document (the
        pre-chunked contract); with it the workspace's doc_id column
        carries real document grouping — doc-scoped DML and evaluate()'s
        doc-coherence relevance key on it. chunk_idx_col: optional
        within-document ordinal; REQUIRED (alongside doc_col) for the
        Q15 neighbor-context windows to order siblings meaningfully —
        without it all siblings share chunk_idx 0 and neighbor order is
        arbitrary.

        upsert=True re-indexes changed documents in place (the reference
        flow when a PDF is re-added): rows MERGE by id instead of
        appending, so the revised version replaces the old chunks —
        bucket-scoped on a bucketed workspace."""
        embed = self.embed_udf or make_embed_udf(self.dim)
        doc_ident = (
            F.col(doc_col).cast("string")
            if doc_col
            else F.col("doc_id").cast("string")
        )
        chunks = (
            docs.filter(F.length(F.trim(F.col("text"))) > 3)
            .select(
                F.col("doc_id").cast("long").alias("id"),
                doc_ident.alias("doc_id"),
                F.lit(source_file).alias("source_file"),
                F.lit(1).alias("page_num"),
                # pre-chunked input: each doc IS its single chunk (a
                # doc_id-derived ordinal would overflow int for
                # content-hash ids) unless the caller names the real
                # within-doc ordinal via chunk_idx_col
                (
                    F.col(chunk_idx_col).cast("int")
                    if chunk_idx_col
                    else F.lit(0)
                ).alias("chunk_idx"),
                "text",
            )
            .withColumn("embedding", embed(F.col("text")))
            .withColumn("model_sig", F.lit(f"hash-embed-{self.dim}"))
            .withColumn("model_dim", F.lit(self.dim))
            .withColumn("heading_path", F.lit(""))
            .withColumn("heading_level", F.lit(0))
            .withColumn("chunk_type", F.lit("text"))
            .withColumn("sentence_count", F.lit(1))
            .withColumn("list_type", F.lit(""))
            .withColumn("list_length", F.lit(0))
            .withColumn("boost_factor", F.lit(1.0))
            .withColumn("created_at", F.lit(self.asof).cast("timestamp"))
        )
        if upsert:
            self.workspace.merge_chunks(chunks)
        else:
            self.workspace.add_chunks(chunks)
        self.cache.clear()  # cached results are stale once the corpus changes
        self._corpus_hint = None
        return self.workspace.count()

    def _rollup_chunk_total(self) -> int | None:
        """Governor depth hint from the maintained doc rollup: the folded
        total chunk count — a rollup-sized aggregate (one row per doc of
        partials), NOT a corpus scan, and DML-maintained so never stale.
        Keyed on the workspace mutation stamp (a (file count, max mtime
        ns, total bytes) tuple from one directory listing, no Spark
        job), so DML from ANY writer — this engine, a streaming
        upsert, a second engine on the same path — invalidates the hint
        (ADVICE r6); None on rollup-less workspaces keeps the governor
        exactly as before."""
        try:
            stamp = self.workspace.mutation_stamp()
        except Exception:
            stamp = -1
        if self._corpus_hint is None or self._corpus_hint.get("stamp") != stamp:
            n = None
            try:
                if self.workspace._rollup_enabled() and self.workspace._exists(
                    "doc_rollup"
                ):
                    row = self.workspace.doc_rollup().agg(
                        F.sum("n_chunks").alias("n")
                    ).first()
                    n = int(row["n"]) if row["n"] is not None else None
            except Exception:
                n = None
            self._corpus_hint = {"n_chunks": n, "stamp": stamp}
        return self._corpus_hint.get("n_chunks")

    # -- search (SURVEY §3.2) --------------------------------------------
    def search(
        self,
        query: str,
        k: int = 5,
        use_rerank: bool = False,
        use_mmr: bool = False,
        use_exploration: bool = False,
        use_ann: bool | None = None,
    ) -> list[dict]:
        """Full hybrid pipeline with serving-state wiring. Returns ranked
        result dicts (id, text, score, semantic_rank, keyword_rank, ...).

        use_ann: None (default) probes a persisted index when one exists
        (RP-LSH preferred, else the maintained IVF assignment table) —
        the semantic branch then scores only the index candidates
        instead of scanning every vector (the 100 TB serving shape; both
        index families are DML-maintained so they are never stale). True
        requires an index (raises if absent), False forces the exact
        full scan. Ranking within candidates is exact cosine either
        way."""
        qvec = self.embed_text(query)
        ann = self.workspace.ann_index() if use_ann is not False else None
        ivf = (
            self.workspace.ivf_index()
            if (use_ann is not False and ann is None)
            else None
        )
        if use_ann is True and ann is None and ivf is None:
            raise ValueError("use_ann=True but the workspace has no ANN index")
        ann_kind = 1 if ann is not None else (2 if ivf is not None else 0)
        variant = (
            f"k={k};r={int(use_rerank)};m={int(use_mmr)}"
            f";x={int(use_exploration)};a={ann_kind}"
        )
        cached = self.cache.get(query, qvec, variant=variant)
        if cached is not None:
            return cached

        t0 = time.perf_counter()
        it = intent_mod.detect_intent(query)
        plan = self.governor.plan(
            k,
            intent_mod.route(it).depth_mult,
            it,
            corpus_chunks=self._rollup_chunk_total(),
        )

        chunks = self.workspace.chunks()
        corpus = chunks.select(
            F.col("id").alias("doc_id"), "text", "chunk_type", "heading_level"
        )
        vecs = chunks.select(F.col("id").alias("vec_id"), "embedding")
        logs = self.workspace.retrieval_logs()

        if not plan["vector_branch"]:
            from .operators.keyword import keyword_search

            # the latency-degraded path still returns REAL chunk text:
            # the reference's FTS bypass selects text_chunk
            # (vector_store.cpp:248-275). The ≤depth hit ids broadcast
            # into the corpus scan — one hash join, no corpus shuffle.
            hits = keyword_search(
                corpus, query, plan["depth"], id_col="doc_id", text_col="text"
            ).select(F.col("id"), "match_cnt")
            with_text = corpus.join(
                F.broadcast(hits), corpus["doc_id"] == hits["id"], "inner"
            ).select("id", "text", "match_cnt")
            rows = [
                {"id": r["id"], "text": r["text"], "score": 0.5,
                 "semantic_rank": 0, "keyword_rank": i + 1}
                for i, r in enumerate(
                    sorted(
                        with_text.collect(),
                        key=lambda r: (-r["match_cnt"], r["id"]),
                    )
                )
            ][:k]
        else:
            # k governs the route depth inside hybrid_search; MMR /
            # exploration / rerank need the FULL fused candidate set, so
            # fetch it untruncated and resize to k at the end (same order
            # of operations as the reference, vector_store.cpp:460-556)
            prefilter = None
            if ann is not None:
                from .operators.similarity import rp_lsh_candidates

                buckets, a_dim, a_planes, a_tables = ann
                prefilter = rp_lsh_candidates(
                    buckets, qvec, a_dim, a_planes, a_tables
                )
            elif ivf is not None:
                prefilter = self.workspace.ivf_candidates(
                    qvec, n_probe=self.ivf_n_probe
                )
            fused = hybrid_search(
                corpus, vecs, query, qvec, k=k, logs=logs,
                chunk_type_col="chunk_type", heading_level_col="heading_level",
                # heading-augmented FTS probe (vector_store.cpp:195-200):
                # a query hitting only a section title still matches
                fts_index=self.workspace.fts_index(),
                return_fused=True,
                vec_prefilter=prefilter,
            )
            rows = [r.asDict() for r in fused.collect()]

        stability = fusion.query_stability(logs, query)
        mmr_decay = 1.0  # v15 log slot: λ of the MMR pass, 1.0 = no decay
        if use_mmr and len(rows) > 1:
            lam = mmr_mod.mmr_lambda(query, it)
            mmr_decay = lam
            entropy = mmr_mod.doc_entropy(rows, doc_key="id")
            avg_entropy = self.mmr_state.update_entropy(entropy)
            rows, _pen = mmr_mod.mmr_select(
                rows, k, lam, avg_entropy, doc_key="id", path_key="text"
            )
        if use_exploration:
            # semantic-branch candidates in semantic-rank order, cosine
            # sims attached by hybrid_search(return_fused): the reference
            # walks semanticRes with the 0.65 threshold on cosine and
            # trust on the stored boost factor (vector_store.cpp:533-554)
            sem_cands = sorted(
                (r for r in rows if (r.get("semantic_rank") or 0) > 0),
                key=lambda r: r["semantic_rank"],
            )
            probe_ids = [r["id"] for r in sem_cands[k:]]
            trust = (
                {
                    t["id"]: float(t["boost_factor"])
                    for t in chunks.filter(F.col("id").isin(probe_ids))
                    .select("id", "boost_factor")
                    .collect()
                }
                if probe_ids
                else {}
            )
            for r in sem_cands:
                r["trust"] = trust.get(r["id"], 1.0)
            rows, _injected = mmr_mod.exploration_inject(
                rows, sem_cands, k, stability, it, trust_key="trust", sim_key="sim"
            )
        if use_rerank:
            rows = rerank_rows(query, rows, topk=k, calibrator=self.calibrator)
        rows = rows[:k]

        self.governor.observe((time.perf_counter() - t0) * 1000)
        top_sem = int(rows[0].get("semantic_rank", 0) or 0) if rows else 0
        self.workspace.log_retrieval(
            query=query,
            semantic_rank=top_sem,
            keyword_rank=rows[0].get("keyword_rank", 0) if rows else 0,
            final_rank=1,
            top_score=float(rows[0]["score"]) if rows else 0.0,
            # rank_delta vs the pure-semantic top (vector_store.cpp:565)
            rank_delta=max(0, top_sem - 1),
            stability=stability,
            mmr_decay=mmr_decay,
            created_at=self.asof,
        )
        self.cache.put(query, rows, qvec, variant=variant)
        return rows

    # -- deep dive (SURVEY §3.3) -----------------------------------------
    def deep_dive(self, query: str, k: int = 5, offset: int = 2, llm=None):
        """Top-k search → neighbor-window contexts (Q15/Q16) → fact
        clustering → synthesis → validated claims (Y1-Y3). `llm`
        overrides the deterministic stub synthesizer — pass
        `synthesis.http_synthesizer(HttpChatProvider(...))` to run the
        reference's live generateContent/chat synthesis
        (`gemini_api.cpp:420-476`)."""
        top = self.search(query, k)
        if not top:
            return []
        ids = [r["id"] for r in top]
        # the context window only needs SAME-DOC neighbors, so restrict
        # the scan to the hit documents BEFORE the window — a filter after
        # the window cannot prune through it, and would shuffle the whole
        # corpus per deep-dive. On a bucketed workspace chunks_for_docs
        # partition-prunes to the hit buckets.
        hit_docs = [
            r["doc_id"]
            for r in self.workspace.chunks()
            .filter(F.col("id").isin(ids))
            .select("doc_id")
            .distinct()
            .collect()
        ]
        ctx_df = source_context(
            self.workspace.chunks_for_docs(hit_docs),
            offset,
            stage="synthesis",
            doc_col="doc_id",
            idx_col="chunk_idx",
            text_col="text",
        ).filter(F.col("id").isin(ids))
        ctx_rows = {r["id"]: r for r in ctx_df.collect()}
        contexts = []
        for i, r in enumerate(top):
            c = ctx_rows.get(r["id"])
            contexts.append(
                SourceContext(
                    prompt_index=i + 1,
                    doc_name=str(r["id"]),
                    trust_score=1.0,
                    chunk_text=(c["context"] if c else (r.get("text") or ""))[:500],
                    final_score=float(r["score"]),
                    embedding=self.embed_text((r.get("text") or "")),
                )
            )
        if llm is not None:
            return synthesize(query, contexts, llm=llm)
        return synthesize(query, contexts)

    # -- session-state persistence (`mainwindow.cpp:499-503`) -------------
    def evaluate(
        self, n_queries: int = 10, k: int = 5, use_ann: bool | None = None
    ) -> dict:
        """Retrieval-quality self-check over the indexed workspace:
        sample `n_queries` chunks deterministically (smallest ids), use
        each chunk's text as the query, and treat the OTHER chunks of
        the same source document as relevant (doc-coherence relevance —
        the standard zero-label proxy for "did retrieval stay on
        topic"). Returns mean recall@k / MRR / nDCG@k plus per-query
        rows, computed by operators/evalmetrics.retrieval_metrics.

        The query chunk itself always matches its own text — it is
        excluded from both rankings and qrels, so a perfect engine
        scores 1.0 only by ranking its doc-siblings on top."""
        from pyspark.sql import functions as F

        from .operators.evalmetrics import retrieval_metrics

        chunks = self.workspace.chunks()
        sample = (
            chunks.select("id", "doc_id", "text")
            .orderBy("id")
            .limit(int(n_queries))
            .collect()
        )
        rank_rows = []
        # sibling counts for the SAMPLED docs only — never a
        # workspace-cardinality driver collect. On a rollup-enabled
        # workspace the counts come straight from the maintained doc
        # rollup (chunks-per-doc is literally its n_chunks column):
        # one fewer corpus aggregate per evaluation pass.
        sampled_docs = list({row["doc_id"] for row in sample})
        if self.workspace._rollup_enabled() and self.workspace._exists(
            "doc_rollup"
        ):
            sibling_counts = {
                r["doc_id"]: int(r["n_chunks"])
                for r in self.workspace.doc_rollup()
                .filter(F.col("doc_id").isin(sampled_docs))
                .select("doc_id", "n_chunks")
                .collect()
            }
        else:
            sibling_counts = {
                r["doc_id"]: r["n"]
                for r in chunks.filter(F.col("doc_id").isin(sampled_docs))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        # every sibling-having sampled query counts toward the mean —
        # including ones whose search returns NO non-self hits (they
        # must score 0, not silently vanish; the harness would
        # otherwise overstate quality exactly when retrieval fails)
        qid_set = set()
        for row in sample:
            if sibling_counts.get(row["doc_id"], 1) < 2:
                continue  # no siblings -> no denominator
            qid_set.add(int(row["id"]))
            hits = self.search(row["text"], k=k + 1, use_ann=use_ann)
            rank = 0
            for h in hits:
                if h["id"] == row["id"]:
                    continue  # self-match excluded
                rank += 1
                if rank > k:
                    break
                rank_rows.append((int(row["id"]), int(h["id"]), rank))
        if not qid_set:
            return {"n_queries": 0, "recall_at_k": None, "mrr": None, "ndcg_at_k": None}
        sib = (
            chunks.select(F.col("id").alias("doc_chunk"), "doc_id")
            .join(
                chunks.select(
                    F.col("id").alias("q_id"), F.col("doc_id").alias("qdoc")
                ).filter(F.col("q_id").isin([int(q) for q in qid_set])),
                F.col("doc_id") == F.col("qdoc"),
            )
            .filter(F.col("doc_chunk") != F.col("q_id"))
            .select("q_id", F.col("doc_chunk").alias("doc_id"))
        )
        spark = self.spark
        rankings = spark.createDataFrame(
            rank_rows, "q_id long, doc_id long, rank long"
        )
        per_q = retrieval_metrics(rankings, sib, k=k).collect()
        n = len(per_q)
        mean = lambda c: round(sum(r[c] for r in per_q) / n, 6) if n else None
        return {
            "n_queries": n,
            "recall_at_k": mean("recall_at_k"),
            "mrr": mean("mrr"),
            "ndcg_at_k": mean("ndcg_at_k"),
            "per_query": [r.asDict() for r in sorted(per_q, key=lambda r: r["q_id"])],
        }

    def save_session_state(self) -> None:
        """Persist the rerank calibrator's μ/σ into workspace metadata so
        the next session resumes calibrated (the reference writes these
        on window close). Call at session end — or any checkpoint."""
        for k, v in self.calibrator.to_kv("rerank").items():
            self.workspace.set_metadata(k, v)

    # -- feedback (S6/S7) -------------------------------------------------
    def click(self, query: str, chunk_id: int, was_exploration: bool = False) -> None:
        # index_documents mints id = cast(doc_id as long), so the clicked
        # chunk's doc_id is recoverable here — carrying it lets boost
        # compaction map deltas to buckets without any corpus read
        self.workspace.add_interaction(
            query, chunk_id, was_exploration, self.asof, doc_id=str(chunk_id)
        )
        if not was_exploration:
            self.cache.clear()  # the boost changed cached scores

    # -- row-level DML (reference UPDATE/DELETE, `vector_store.cpp:789-795`)
    def delete_document(self, doc_id: str) -> None:
        """Drop one document's chunks (bucket-scoped on a bucketed
        workspace) and invalidate cached results that may cite it."""
        self.workspace.delete_doc(doc_id)
        self.cache.clear()
        self._corpus_hint = None
