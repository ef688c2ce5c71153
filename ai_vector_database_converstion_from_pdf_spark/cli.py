"""Command-line front-end — the reference's GUI operations as commands.

Maps every user-facing action of the reference app (`mainwindow.cpp`:
add PDFs, search, click feedback, deep dive, CSV export, workspace
maintenance) onto the engine, so a reference user can drive the Spark
engine end-to-end without writing code:

    python -m ai_vector_database_converstion_from_pdf_spark.cli index-pdf  -w WS --pdf-glob 'docs/*.pdf'
    python -m ai_vector_database_converstion_from_pdf_spark.cli index-text -w WS --parquet docs.parquet
    python -m ai_vector_database_converstion_from_pdf_spark.cli search     -w WS -q "how to merge" -k 5 --rerank
    python -m ai_vector_database_converstion_from_pdf_spark.cli deep-dive  -w WS -q "merge strategy"
    python -m ai_vector_database_converstion_from_pdf_spark.cli click      -w WS -q "how to merge" --chunk-id 3
    python -m ai_vector_database_converstion_from_pdf_spark.cli export     -w WS --out chunks.csv
    python -m ai_vector_database_converstion_from_pdf_spark.cli stats      -w WS
    python -m ai_vector_database_converstion_from_pdf_spark.cli optimize   -w WS
    python -m ai_vector_database_converstion_from_pdf_spark.cli vacuum     -w WS
    python -m ai_vector_database_converstion_from_pdf_spark.cli rollup     -w WS enable
    python -m ai_vector_database_converstion_from_pdf_spark.cli build-index -w WS --kind ivf
    python -m ai_vector_database_converstion_from_pdf_spark.cli fts-match  -w WS -q '"exact phrase" OR tok*'
    python -m ai_vector_database_converstion_from_pdf_spark.cli prepare-training --parquet docs.parquet --out prep/ -w WS

Output is one JSON object per line on stdout (machine-consumable, like
the driver contract); diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark

    return get_spark("pvdb-cli")


def _engine(spark, args):
    from .engine import PvdbEngine

    kw = {}
    if getattr(args, "embed_endpoint", None):
        # real HTTP embedding stack (the reference's cloud/local modes):
        # ollama | openai (LM Studio) | gemini (batchEmbedContents)
        from .functions.providers import HttpEmbedProvider, make_http_embed_udf

        prov = HttpEmbedProvider(
            args.embed_endpoint,
            args.embed_model,
            style=args.embed_style,
            api_key=getattr(args, "api_key", "") or "",
        )
        kw["embedder"] = lambda t: prov.embed_batch([t])[0]
        kw["embed_udf"] = make_http_embed_udf(prov)
    return PvdbEngine(spark, args.workspace, dim=args.dim, asof=args.asof, **kw)


def _emit(obj) -> None:
    print(json.dumps(obj, default=str))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pvdb-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("-w", "--workspace", required=True)
        sp.add_argument("--dim", type=int, default=64)
        sp.add_argument("--asof", default=None)
        # real HTTP embedding provider (default: deterministic hash stub)
        sp.add_argument("--embed-endpoint", help="e.g. http://127.0.0.1:11434")
        sp.add_argument("--embed-model", default="nomic-embed-text")
        sp.add_argument(
            "--embed-style", choices=["ollama", "openai", "gemini"],
            default="ollama",
        )
        sp.add_argument("--api-key", default="", help="gemini ?key= value")

    sp = sub.add_parser("index-pdf", help="I1-I10: PDFs -> chunks -> index")
    common(sp)
    sp.add_argument("--pdf-glob", required=True)
    sp.add_argument("--upsert", action="store_true")

    sp = sub.add_parser("index-text", help="index pre-chunked (doc_id, text) parquet")
    common(sp)
    sp.add_argument(
        "--doc-col",
        help="column carrying the source-document identity of each chunk",
    )
    sp.add_argument("--parquet", required=True)
    sp.add_argument("--upsert", action="store_true")

    sp = sub.add_parser("search", help="hybrid search (Q1-Q17)")
    common(sp)
    sp.add_argument("-q", "--query", required=True)
    sp.add_argument("-k", type=int, default=5)
    sp.add_argument("--rerank", action="store_true")
    sp.add_argument("--mmr", action="store_true")
    sp.add_argument("--explore", action="store_true")

    sp = sub.add_parser("deep-dive", help="Y1-Y4: search -> context -> claims")
    common(sp)
    sp.add_argument("-q", "--query", required=True)
    sp.add_argument("-k", type=int, default=5)
    # live synthesis LLM (default: deterministic stub synthesizer)
    sp.add_argument("--chat-endpoint", help="generateContent/chat endpoint")
    sp.add_argument("--chat-model", default="gemini-1.5-flash")
    sp.add_argument(
        "--chat-style", choices=["gemini", "ollama", "openai"],
        default="gemini",
    )

    sp = sub.add_parser(
        "discover",
        help="M1/M3 model discovery: probe Ollama/LM Studio/Gemini "
        "endpoints, emit (name, engine, capabilities) per model",
    )
    sp.add_argument("--ollama", help="Ollama base URL")
    sp.add_argument("--lmstudio", help="LM Studio base URL")
    sp.add_argument("--gemini", help="Gemini base URL")
    sp.add_argument("--api-key", default="")

    sp = sub.add_parser("click", help="S7: click feedback (+0.1 boost)")
    common(sp)
    sp.add_argument("-q", "--query", required=True)
    sp.add_argument("--chunk-id", type=int, required=True)
    sp.add_argument("--exploration", action="store_true")

    sp = sub.add_parser(
        "fts-match",
        help="raw FTS5 MATCH (phrase/NEAR/boolean/prefix/plain) over the corpus",
    )
    common(sp)
    sp.add_argument("-q", "--query", required=True)
    sp.add_argument("-k", type=int, default=10)

    sp = sub.add_parser("export", help="S2: CSV/JSONL export")
    common(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--format", choices=["csv", "jsonl"], default="csv")
    sp.add_argument("--embeddings", action="store_true",
                    help="carry vectors in the JSONL export")

    for name in ("stats", "optimize", "vacuum"):
        sp = sub.add_parser(name)
        common(sp)

    sp = sub.add_parser(
        "rollup", help="continuous per-doc aggregate: enable | show | compact"
    )
    common(sp)
    sp.add_argument("action", choices=["enable", "show", "compact"])
    sp.add_argument("--limit", type=int, default=10)

    sp = sub.add_parser(
        "build-index",
        help="persisted DML-maintained index: lsh (RP-LSH), ivf, or fts "
        "(inverted keyword index)",
    )
    common(sp)
    sp.add_argument("--kind", choices=["lsh", "ivf", "fts"], default="lsh")
    sp.add_argument("--planes", type=int, default=4)
    sp.add_argument("--tables", type=int, default=8)
    sp.add_argument(
        "--centroids",
        default="auto",
        help="IVF cell count, or 'auto' (2*sqrt(N), the measured-recall"
        " default)",
    )

    sp = sub.add_parser(
        "snapshot",
        help="zero-copy workspace snapshots: create | list | restore | "
        "drop | diff (chunk-level corpus delta)",
    )
    common(sp)
    sp.add_argument(
        "action", choices=["create", "list", "restore", "drop", "diff"]
    )
    sp.add_argument("--tag", help="snapshot tag (required except for list)")
    sp.add_argument(
        "--against",
        help="diff only: second snapshot tag (default: the live table)",
    )

    sp = sub.add_parser(
        "dedup-report",
        help="near-dup audit of the workspace: pairs -> clusters -> "
        "quality-aware keepers",
    )
    common(sp)
    sp.add_argument(
        "--method",
        choices=["exact", "minhash", "simhash", "ngram", "neighborhood"],
        default="minhash",
    )
    sp.add_argument("--threshold", type=float, default=0.8)
    sp.add_argument("--limit", type=int, default=10)

    sp = sub.add_parser(
        "prepare-training",
        help="end-to-end training-data prep: curate -> split -> pack -> shards",
    )
    common(sp)
    sp.add_argument("--parquet", required=True, help="(doc_id, text) input")
    sp.add_argument("--out", required=True, help="output directory")
    sp.add_argument("--capacity", type=int, default=512, help="tokens per pack")
    sp.add_argument("--shards", type=int, default=8)
    sp.add_argument("--split-salt", default="v1")

    sp = sub.add_parser(
        "select-data",
        help="DSIR + quality-probe target-domain selection over a corpus",
    )
    common(sp)
    sp.add_argument("--parquet", required=True, help="(doc_id, text, ...) input")
    sp.add_argument(
        "--target-filter",
        required=True,
        help="SQL predicate defining the target slice, e.g. \"lang = 'en'\"",
    )
    sp.add_argument("--top", type=int, default=100)
    sp.add_argument(
        "--probe",
        action="store_true",
        help="also train the 2-step logistic probe and report its score",
    )
    sp.add_argument("--out", help="write the selected docs as parquet")

    sp = sub.add_parser(
        "evaluate",
        help="retrieval-quality self-check: recall@k / MRR / nDCG@k over "
        "doc-coherence relevance",
    )
    common(sp)
    sp.add_argument("--queries", type=int, default=10)
    sp.add_argument("-k", type=int, default=5)
    sp.add_argument("--ann", action="store_true", help="route through the ANN index")

    args = p.parse_args(argv)
    if args.cmd == "snapshot" and args.action != "list" and not args.tag:
        p.error(f"snapshot {args.action} requires --tag")
    if args.cmd == "discover":
        # no Spark session needed: pure HTTP probes + name inference
        from .functions.providers import (
            gemini_probe,
            lmstudio_probe,
            ollama_probe,
        )
        from .models import make_model

        found = []
        for probe in (
            (lambda: ollama_probe(args.ollama)) if args.ollama else None,
            (lambda: lmstudio_probe(args.lmstudio)) if args.lmstudio else None,
            (lambda: gemini_probe(args.gemini, api_key=args.api_key))
            if args.gemini
            else None,
        ):
            if probe is None:
                continue
            try:
                found.extend(probe())
            except Exception as e:  # unreachable endpoint: skip, like the reference
                print(f"probe failed: {e}", file=sys.stderr)
        for n, e, u in found:
            m = make_model(n, e, u)
            _emit(
                {
                    "name": m.name,
                    "engine": m.engine,
                    "capabilities": list(m.capabilities),
                }
            )
        return 0

    spark = _spark()

    if args.cmd == "index-pdf":
        from pyspark.sql import functions as F

        from .plans.ingest_pdf import pdf_to_chunks

        chunks = pdf_to_chunks(spark, args.pdf_glob)
        # ids derive from CONTENT (xxhash64 of source doc + chunk index),
        # not a per-invocation row_number: the reference app accumulates
        # PDFs across add operations (mainwindow.cpp ingest flow), so a
        # second `index-pdf` into the same workspace must not reuse ids
        # 1..N — plain append would collide chunk ids (click/boost keys)
        # and --upsert would silently replace unrelated documents. Masked
        # to non-negative so ids sort/display like the reference's rowids.
        docs = chunks.select(
            F.xxhash64(F.col("doc"), F.col("chunk_idx"))
            .bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
            .alias("doc_id"),
            F.col("doc").alias("source_doc"),
            F.col("chunk_idx").alias("source_chunk_idx"),
            "text",
        )
        eng = _engine(spark, args)
        # doc_col + chunk_idx_col: chunk ids stay content-hashed
        # (re-index stable), but the workspace rows now carry the real
        # SOURCE DOCUMENT and within-doc ordinal, so doc-scoped DML,
        # Q15 neighbor windows, and evaluate's doc-coherence relevance
        # all work after a CLI ingest
        n = eng.index_documents(
            docs, source_file=args.pdf_glob, upsert=args.upsert,
            doc_col="source_doc", chunk_idx_col="source_chunk_idx",
        )
        _emit({"indexed": n})
    elif args.cmd == "index-text":
        eng = _engine(spark, args)
        cols = ["doc_id", "text"] + (
            [args.doc_col] if args.doc_col and args.doc_col not in ("doc_id", "text") else []
        )
        docs = spark.read.parquet(args.parquet).select(*cols)
        n = eng.index_documents(
            docs, source_file=args.parquet, upsert=args.upsert,
            doc_col=args.doc_col,
        )
        _emit({"indexed": n})
    elif args.cmd == "search":
        eng = _engine(spark, args)
        res = eng.search(
            args.query,
            k=args.k,
            use_rerank=args.rerank,
            use_mmr=args.mmr,
            use_exploration=args.explore,
        )
        for r in res:
            _emit(r)
    elif args.cmd == "deep-dive":
        eng = _engine(spark, args)
        llm = None
        if args.chat_endpoint:
            from .functions.providers import HttpChatProvider
            from .operators.synthesis import http_synthesizer

            llm = http_synthesizer(
                HttpChatProvider(
                    args.chat_endpoint,
                    args.chat_model,
                    style=args.chat_style,
                    api_key=args.api_key,
                )
            )
        claims = eng.deep_dive(args.query, k=args.k, llm=llm)
        for c in claims:
            _emit(
                {
                    "statement": c.statement,
                    "sources": list(c.source_indices),
                    "confidence": c.confidence,
                }
            )
    elif args.cmd == "click":
        eng = _engine(spark, args)
        eng.click(args.query, args.chunk_id, was_exploration=args.exploration)
        _emit({"clicked": args.chunk_id})
    elif args.cmd == "fts-match":
        # the reference hands the raw user string to `embeddings_fts
        # MATCH :q` (vector_store.cpp:251-262); match_search is that
        # front door — syntax dispatch, flat-score contract, broadcast
        # text fetch-back for the <=k hits
        from pyspark.sql import functions as F

        from .operators.keyword import match_search
        from .sinks import Workspace

        ws = Workspace(spark, args.workspace)
        corpus = ws.chunks().select("id", "text")
        hits = match_search(corpus, args.query, args.k)
        score_col = hits.columns[1]  # match_cnt / phrase_cnt / near_cnt / hit_groups
        rows = {r["id"]: r for r in hits.collect()}
        texts = {
            r["id"]: r["text"]
            for r in corpus.join(
                F.broadcast(hits.select("id")), "id", "left_semi"
            ).collect()
        }
        ranked = sorted(rows.values(), key=lambda r: (-r[score_col], r["id"]))
        for r in ranked:
            _emit(
                {
                    "id": r["id"],
                    score_col: r[score_col],
                    "kw_score": r["kw_score"],
                    "text": texts.get(r["id"]),
                }
            )
    elif args.cmd == "export":
        from .sinks import Workspace

        ws = Workspace(spark, args.workspace)
        if args.format == "jsonl":
            ws.export_jsonl(args.out, with_embeddings=args.embeddings)
        else:
            ws.export_csv(args.out)
        _emit({"exported": args.out, "format": args.format})
    elif args.cmd == "stats":
        from .sinks import Workspace

        ws = Workspace(spark, args.workspace)
        n = ws.count() if ws._exists("chunks") else 0
        hist = [
            {"version": r["version"], "op": r["op"]}
            for r in ws.history().limit(5).collect()
        ]
        _emit({"chunks": n, "recent_ops": hist})
    elif args.cmd == "rollup":
        from .sinks import Workspace

        ws = Workspace(spark, args.workspace)
        if args.action == "enable":
            ws.enable_doc_rollup()
            _emit({"rollup": "enabled", "docs": ws.doc_rollup().count()})
        elif args.action == "compact":
            ws.compact_rollup()
            _emit({"rollup": "compacted"})
        else:
            for r in (
                ws.doc_rollup().orderBy("doc_id").limit(args.limit).collect()
            ):
                _emit(r.asDict())
    elif args.cmd == "build-index":
        from .sinks import Workspace

        ws = Workspace(spark, args.workspace)
        if args.kind == "lsh":
            n = ws.build_ann_index(
                dim=args.dim, n_planes=args.planes, n_tables=args.tables
            )
        elif args.kind == "fts":
            n = ws.build_fts()
        else:
            nc = None if args.centroids == "auto" else int(args.centroids)
            n = ws.build_ivf_index(dim=args.dim, n_centroids=nc)
        _emit({"index": args.kind, "rows": n})
    elif args.cmd == "snapshot":
        from .sinks import Workspace

        ws = Workspace(spark, args.workspace)
        if args.action == "list":
            _emit({"snapshots": ws.list_snapshots()})
        elif args.action == "create":
            _emit(ws.snapshot(args.tag))
        elif args.action == "restore":
            _emit(ws.restore(args.tag))
        elif args.action == "diff":
            # aggregate distributedly: the delta can be corpus-sized
            # (every chunk changed), so the driver reads only one count
            # row per status plus a bounded 10-id sample per status —
            # never the full delta (snapshot_diff's no-driver-state
            # contract holds through the CLI)
            from pyspark.sql import Window as _W
            from pyspark.sql import functions as F

            d = ws.snapshot_diff(args.tag, args.against)
            w = _W.partitionBy("status").orderBy("id")
            top = (
                d.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= 10)
                .groupBy("status")
                .agg(F.sort_array(F.collect_list("id")).alias("ids"))
            )
            counts = {
                r["status"]: int(r["n"])
                for r in d.groupBy("status").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            sample = {
                r["status"]: [int(i) for i in r["ids"]] for r in top.collect()
            }
            _emit(
                {
                    "diff": args.tag,
                    "against": args.against or "live",
                    "counts": dict(sorted(counts.items())),
                    "sample": dict(sorted(sample.items())),
                }
            )
        else:
            ws.drop_snapshot(args.tag)
            _emit({"dropped": args.tag})
    elif args.cmd == "dedup-report":
        # the dedup family end-to-end over the indexed corpus: pick a
        # pair finder, resolve clusters, keep the cleanest copy per
        # cluster (quality_canonical); emits a summary line plus the
        # largest clusters. All stages are the oracle-checked operators.
        from pyspark.sql import functions as F

        from .operators import dedup as dd
        from .sinks import Workspace

        ws = Workspace(spark, args.workspace)
        docs = ws.chunks().select(F.col("id").alias("doc_id"), "text")
        if args.method == "exact":
            groups = dd.exact_dedup(docs)
            pairs = (
                docs.select(
                    dd.content_hash(F.col("text")).alias("text_hash"),
                    F.col("doc_id").alias("id"),
                )
                .join(
                    groups.filter(F.col("dup_cnt") > 1).select(
                        "text_hash", "keeper_id"
                    ),
                    "text_hash",
                )
                .filter(F.col("id") != F.col("keeper_id"))
                .select(
                    F.col("keeper_id").alias("id_a"), F.col("id").alias("id_b")
                )
            )
        elif args.method == "minhash":
            pairs = dd.minhash_lsh_pairs(docs, threshold=args.threshold)
        elif args.method == "simhash":
            pairs = dd.simhash_pairs(docs, max_hamming=3)
        elif args.method == "ngram":
            pairs = dd.ngram_jaccard_prefix_pairs(docs, threshold=args.threshold)
        else:
            pairs = dd.sorted_neighborhood_pairs(
                docs, threshold=max(args.threshold, 0.8)
            )
        res = dd.quality_canonical(docs, pairs.select("id_a", "id_b"))
        agg = res.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
            F.count_distinct(
                F.when(F.col("is_dup"), F.col("cluster_id"))
            ).alias("n_dup_clusters"),
        ).collect()[0]
        _emit(
            {
                "method": args.method,
                "n_docs": agg["n_docs"],
                "n_dups": agg["n_dups"],
                "n_dup_clusters": agg["n_dup_clusters"],
            }
        )
        top = (
            res.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("size"),
                F.max(F.col("keeper_id")).alias("keeper_id"),
                F.round(F.max("quality"), 6).alias("keeper_quality"),
            )
            .filter(F.col("size") > 1)
            .orderBy(F.desc("size"), F.asc("cluster_id"))
            .limit(args.limit)
            .collect()
        )
        for r in top:
            _emit(
                {
                    "cluster_id": r["cluster_id"],
                    "size": r["size"],
                    "keeper_id": r["keeper_id"],
                    "keeper_quality": r["keeper_quality"],
                }
            )
    elif args.cmd == "prepare-training":
        # The whole LLM-data pipeline as one command: curation audit
        # (dedup CC + Gopher gates + decontamination + PII scrub) ->
        # deterministic split -> next-fit packing -> sharded export.
        # Every stage is the already-oracle-checked operator; this is
        # composition + manifest, no new semantics.
        from pyspark.sql import functions as F

        from .operators.packing import export_training_shards
        from .operators.sampling import hash_bucket
        from .plans.curate import curate_corpus

        docs = spark.read.parquet(args.parquet).select("doc_id", "text")
        audit = curate_corpus(docs)
        stage_counts = audit.agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum(F.col("dedup_keep").cast("long")).alias("dedup_keep"),
            F.sum(F.col("quality_keep").cast("long")).alias("quality_keep"),
            F.sum(F.col("repetition_keep").cast("long")).alias("repetition_keep"),
            F.sum(F.col("decon_keep").cast("long")).alias("decon_keep"),
            F.sum(F.col("is_eval").cast("long")).alias("n_eval"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        ).collect()[0]
        # kept docs carry the PII-scrubbed text forward
        kept = audit.filter(F.col("keep")).select(
            "doc_id", F.col("redacted").alias("text")
        )
        key = F.concat(F.lit(args.split_salt + ":"), F.col("doc_id").cast("string"))
        split = F.when(hash_bucket(key, 100) < 90, "train").otherwise(
            F.when(hash_bucket(key, 100) < 95, "val").otherwise("test")
        )
        kept = kept.withColumn("split", split)
        split_counts = {
            r["split"]: r["n"]
            for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        train = kept.filter(F.col("split") == "train").drop("split")
        manifest = export_training_shards(
            train,
            f"{args.out}/train",
            capacity=args.capacity,
            n_shards=args.shards,
        )
        for name in ("val", "test"):
            kept.filter(F.col("split") == name).drop("split").write.mode(
                "overwrite"
            ).parquet(f"{args.out}/{name}")
        _emit({"stage_counts": stage_counts.asDict()})
        _emit({"split_counts": split_counts})
        for r in manifest.orderBy("shard").collect():
            _emit({"shard_manifest": r.asDict()})
    elif args.cmd == "evaluate":
        eng = _engine(spark, args)
        rep = eng.evaluate(
            n_queries=args.queries, k=args.k, use_ann=True if args.ann else None
        )
        _emit(
            {
                "n_queries": rep["n_queries"],
                "recall_at_k": rep["recall_at_k"],
                "mrr": rep["mrr"],
                "ndcg_at_k": rep["ndcg_at_k"],
            }
        )
        for r in rep.get("per_query", []):
            _emit(r)
    elif args.cmd == "select-data":
        # DSIR importance resampling toward the --target-filter slice
        # (operators/sampling.py::dsir_importance_weights, oracle entry
        # sample_dsir_weights), optionally blended with the trained
        # logistic quality probe (operators/linear.py, oracle entry
        # quality_linear_probe). Selection = top-N by DSIR weight.
        from pyspark.sql import functions as F

        from .operators.sampling import dsir_importance_weights

        docs = spark.read.parquet(args.parquet)
        n_docs = docs.count()  # counted ONCE, reused in the summary emit
        target = docs.filter(args.target_filter)
        n_target = target.count()
        w = dsir_importance_weights(docs, target)
        if args.probe:
            from .operators.linear import logistic_probe

            scores = logistic_probe(docs, F.expr(args.target_filter)).select(
                F.col("id").alias("doc_id"), F.col("score").alias("probe_score")
            )
            w = w.join(scores, "doc_id", "left")
        top = w.orderBy(F.desc("weight"), F.asc("doc_id")).limit(args.top)
        # collect ONCE; the parquet write joins against the collected id
        # list (a <= top-N literal frame) instead of re-running the whole
        # DSIR(+probe) lineage a second time
        rows = top.collect()
        if args.out:
            ids = spark.createDataFrame(
                [(r["doc_id"],) for r in rows], "doc_id long"
            )
            # dropDuplicates guards a dirty input: duplicate doc_id rows
            # would otherwise fan the join out past --top output rows
            docs.dropDuplicates(["doc_id"]).join(
                F.broadcast(ids), "doc_id"
            ).write.mode("overwrite").parquet(args.out)
        _emit(
            {
                "n_docs": n_docs,
                "n_target": n_target,
                "n_selected": len(rows),
            }
        )
        for r in rows[:10]:
            _emit(r.asDict())
    elif args.cmd == "optimize":
        from .sinks import Workspace

        _emit(Workspace(spark, args.workspace).optimize())
    elif args.cmd == "vacuum":
        from .sinks import Workspace

        _emit(Workspace(spark, args.workspace).vacuum())
    return 0


if __name__ == "__main__":
    sys.exit(main())
