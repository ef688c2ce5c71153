"""CLI front-end: the reference's GUI operations driven end-to-end
in-process (index PDF fixture -> search -> click -> stats -> export)."""

import json

from ai_vector_database_converstion_from_pdf_spark import cli


def _run(capsys, argv):
    rc = cli.main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip()
    return [json.loads(line) for line in out.splitlines() if line]


def test_cli_full_cycle(spark, capsys, tmp_path):
    ws = str(tmp_path / "cli_ws")
    fixture = "tests/fixtures/sample.pdf"

    got = _run(capsys, ["index-pdf", "-w", ws, "--dim", "32",
                        "--asof", "2024-06-01 00:00:00", "--pdf-glob", fixture])
    assert got[0]["indexed"] > 0

    res = _run(capsys, ["search", "-w", ws, "--dim", "32",
                        "--asof", "2024-06-01 00:00:00",
                        "-q", "zorblatt factor merge speed", "-k", "3"])
    assert res and all("score" in r and "text" in r for r in res)
    top_id = res[0]["id"]

    got = _run(capsys, ["click", "-w", ws, "--dim", "32",
                        "--asof", "2024-06-01 00:00:00",
                        "-q", "zorblatt factor merge speed",
                        "--chunk-id", str(top_id)])
    assert got[0]["clicked"] == top_id

    got = _run(capsys, ["stats", "-w", ws])
    assert got[0]["chunks"] > 0
    assert any(o["op"] == "add_chunks" for o in got[0]["recent_ops"])

    out_csv = str(tmp_path / "out.csv")
    got = _run(capsys, ["export", "-w", ws, "--out", out_csv])
    assert got[0]["exported"] == out_csv

    got = _run(capsys, ["vacuum", "-w", ws])
    assert got[0]["removed"] == []


def test_cli_fts_match_modes(spark, capsys, tmp_path):
    """The raw-MATCH front door (vector_store.cpp:251-262) from the CLI:
    phrase, NEAR, boolean, and prefix syntaxes all rank with real text."""
    ws = str(tmp_path / "cli_fts")
    src = str(tmp_path / "fts_in.parquet")
    spark.createDataFrame(
        [
            (1, "merge strategy beats naive merge strategy"),
            (2, "strategy x y merge"),
            (3, "merging tables quickly"),
            (4, "unrelated content row"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    base = ["-w", ws, "--dim", "16", "--asof", "2024-06-01 00:00:00"]
    _run(capsys, ["index-text", *base, "--parquet", src])

    got = _run(capsys, ["fts-match", *base, "-q", '"merge strategy"'])
    assert [r["id"] for r in got] == [1] and got[0]["phrase_cnt"] == 2
    assert "merge strategy" in got[0]["text"]

    got = _run(capsys, ["fts-match", *base, "-q", "NEAR(merge strategy, 2)"])
    assert {r["id"] for r in got} == {1, 2}

    got = _run(capsys, ["fts-match", *base, "-q", "merg* NOT unrelated OR tables"])
    ids = {r["id"] for r in got}
    assert 3 in ids and 4 not in ids


def test_cli_reindex_ids_are_stable(spark, capsys, tmp_path):
    """index-pdf doc ids derive from content (xxhash64 of source doc +
    chunk index), not a per-invocation row_number — so re-indexing the
    same PDFs with --upsert REPLACES the prior chunks instead of
    silently swapping unrelated documents, and ids never restart at 1
    (ADVICE r2 medium)."""
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    ws = str(tmp_path / "cli_ws3")
    fixture = "tests/fixtures/sample.pdf"
    base = ["-w", ws, "--dim", "32", "--asof", "2024-06-01 00:00:00"]

    got = _run(capsys, ["index-pdf", *base, "--pdf-glob", fixture])
    n1 = got[0]["indexed"]
    ids1 = sorted(
        r["id"] for r in Workspace(spark, ws).chunks().select("id").collect()
    )
    assert min(ids1) > len(ids1)  # content hashes, not 1..N ordinals

    got = _run(capsys, ["index-pdf", *base, "--pdf-glob", fixture, "--upsert"])
    assert got[0]["indexed"] == n1  # replaced in place, no duplicate ids
    ids2 = sorted(
        r["id"] for r in Workspace(spark, ws).chunks().select("id").collect()
    )
    assert ids2 == ids1  # same content -> same ids across invocations


def test_cli_index_text_deep_dive_optimize(spark, capsys, tmp_path):
    ws = str(tmp_path / "cli_ws2")
    src = str(tmp_path / "docs_in.parquet")
    spark.createDataFrame(
        [(i, f"merge strategy notes row {i} fast table join value") for i in range(12)],
        "doc_id long, text string",
    ).write.parquet(src)

    got = _run(capsys, ["index-text", "-w", ws, "--dim", "32",
                        "--asof", "2024-06-01 00:00:00", "--parquet", src])
    assert got[0]["indexed"] == 12

    claims = _run(capsys, ["deep-dive", "-w", ws, "--dim", "32",
                           "--asof", "2024-06-01 00:00:00",
                           "-q", "merge strategy", "-k", "3"])
    assert claims and all(
        {"statement", "sources", "confidence"} <= set(c) for c in claims
    )

    got = _run(capsys, ["optimize", "-w", ws])
    assert "files_before" in got[0] or "buckets_compacted" in got[0]


def test_cli_rollup_lifecycle(spark, capsys, tmp_path):
    """rollup enable -> show -> compact from the CLI, staying fresh
    through an indexing operation in between."""
    ws = str(tmp_path / "cli_ru")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    got = _run(capsys, ["index-text", "-w", ws, "--dim", "16",
                        "--asof", "2024-06-01 00:00:00", "--parquet", src])
    assert got[0]["indexed"] > 0

    got = _run(capsys, ["rollup", "-w", ws, "enable"])
    assert got[0] == {"rollup": "enabled", "docs": 2}

    rows = _run(capsys, ["rollup", "-w", ws, "show"])
    assert len(rows) == 2
    assert all(r["n_chunks"] >= 1 and r["total_chars"] > 0 for r in rows)

    got = _run(capsys, ["rollup", "-w", ws, "compact"])
    assert got[0]["rollup"] == "compacted"
    rows2 = _run(capsys, ["rollup", "-w", ws, "show"])
    assert {r["doc_id"] for r in rows2} == {r["doc_id"] for r in rows}


def test_cli_build_index_both_kinds(spark, capsys, tmp_path):
    """build-index builds either maintained index family; search then
    auto-routes through whichever exists."""
    ws = str(tmp_path / "cli_idx")
    docs = spark.createDataFrame(
        [(i, f"document number {i} about merge tables") for i in range(8)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_idx.parquet")
    docs.write.parquet(src)
    _run(capsys, ["index-text", "-w", ws, "--dim", "16",
                  "--asof", "2024-06-01 00:00:00", "--parquet", src])

    got = _run(capsys, ["build-index", "-w", ws, "--dim", "16",
                        "--kind", "ivf", "--centroids", "2"])
    assert got[0]["index"] == "ivf" and got[0]["rows"] == 8

    got = _run(capsys, ["build-index", "-w", ws, "--dim", "16",
                        "--kind", "lsh", "--planes", "3", "--tables", "4"])
    assert got[0]["index"] == "lsh" and got[0]["rows"] == 8 * 4

    res = _run(capsys, ["search", "-w", ws, "--dim", "16",
                        "--asof", "2024-06-01 00:00:00",
                        "-q", "merge tables", "-k", "2"])
    assert len(res) == 2


def test_cli_prepare_training(spark, capsys, tmp_path):
    """End-to-end training-data prep: stage counts consistent, splits
    partition the kept set, shard manifest sums to the train split, and
    exported text is the PII-scrubbed variant."""
    src = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "prep")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select("doc_id", "text").write.parquet(src)

    got = _run(capsys, ["prepare-training", "-w", str(tmp_path / "ws"),
                        "--parquet", src, "--out", out,
                        "--capacity", "64", "--shards", "4"])
    stage = got[0]["stage_counts"]
    splits = got[1]["split_counts"]
    manifests = [g["shard_manifest"] for g in got[2:]]

    n_input = docs.count()
    assert stage["n_input"] == n_input
    assert 0 < stage["n_keep"] <= n_input
    # splits partition the kept set
    assert sum(splits.values()) == stage["n_keep"]
    assert set(splits) <= {"train", "val", "test"}
    # manifest covers exactly the train split
    assert sum(m["n_docs"] for m in manifests) == splits.get("train", 0)
    assert all(m["n_packs"] >= 1 for m in manifests)

    train = spark.read.parquet(f"{out}/train")
    assert train.count() == splits.get("train", 0)
    val = spark.read.parquet(f"{out}/val")
    test = spark.read.parquet(f"{out}/test")
    assert val.count() == splits.get("val", 0)
    assert test.count() == splits.get("test", 0)
    # kept ids from the three splits are disjoint
    import pyspark.sql.functions as F

    ids = (
        train.select("doc_id")
        .union(val.select("doc_id"))
        .union(test.select("doc_id"))
    )
    assert ids.count() == ids.distinct().count() == stage["n_keep"]


def test_cli_dedup_report(spark, capsys, tmp_path):
    """dedup-report finds the planted duplicate pair, resolves one
    cluster, and keeps the cleaner copy."""
    ws = str(tmp_path / "cli_dd")
    base = "the quick brown fox jumps over a lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (1, base + " ;;; !!! ### $$$ %%%"),  # dirty copy
            (2, base),                            # clean copy
            (3, "completely different text about engines and tables"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    got = _run(capsys, ["index-text", "-w", ws, "--dim", "16",
                        "--asof", "2024-06-01 00:00:00", "--parquet", src])
    assert got[0]["indexed"] == 3

    out = _run(capsys, ["dedup-report", "-w", ws, "--method", "minhash",
                        "--threshold", "0.5"])
    summary, clusters = out[0], out[1:]
    assert summary["n_docs"] == 3
    assert summary["n_dups"] == 1
    assert summary["n_dup_clusters"] == 1
    assert len(clusters) == 1
    assert clusters[0]["size"] == 2
    # quality-aware keeper: the clean copy (id 2), not the smaller id
    assert clusters[0]["keeper_id"] == 2

    # exact method: no byte-identical dups in this workspace
    out = _run(capsys, ["dedup-report", "-w", ws, "--method", "exact"])
    assert out[0]["n_dups"] == 0


def test_cli_select_data(spark, capsys, tmp_path):
    """select-data: DSIR selection toward a target slice, probe blend,
    and parquet output of the selected docs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_sel.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "selected")

    got = _run(
        capsys,
        [
            "select-data", "-w", str(tmp_path / "ws_unused"),
            "--parquet", src, "--target-filter", "lang = 'en'",
            "--top", "10", "--probe", "--out", out,
        ],
    )
    head = got[0]
    assert head["n_selected"] == 10
    assert head["n_target"] > 0
    # emitted rows carry both scores, ordered by weight desc
    weights = [r["weight"] for r in got[1:]]
    assert weights == sorted(weights, reverse=True)
    assert all("probe_score" in r for r in got[1:])
    sel = spark.read.parquet(out)
    assert sel.count() == 10
    # the selection is biased toward the target slice vs the corpus base rate
    en_rate_sel = sel.filter("lang = 'en'").count() / 10
    en_rate_all = docs.filter("lang = 'en'").count() / docs.count()
    assert en_rate_sel > en_rate_all


def test_cli_evaluate(spark, capsys, tmp_path):
    """evaluate: index multi-chunk docs, then the doc-coherence
    self-check returns sane metric ranges and per-query rows."""
    ws = str(tmp_path / "cli_eval")
    # 3 source docs x 3 chunks each, chunked vocabularies kept coherent
    # per doc so siblings rank above other docs
    vocab = {
        "A": "alpha beta gamma delta epsilon zeta eta theta",
        "B": "omicron pi rho sigma tau upsilon phi chi",
        "C": "lambzeta kappa iota mu nu xi omega psi",
    }
    rows = []
    cid = 1
    for d, words in vocab.items():
        for j in range(3):
            rows.append((cid, d, (words + f" part{j} ") * 20))
            cid += 1
    docs = spark.createDataFrame(rows, "doc_id long, src_doc string, text string")
    src = str(tmp_path / "docs_eval.parquet")
    docs.write.parquet(src)
    got = _run(capsys, ["index-text", "-w", ws, "--dim", "16",
                        "--asof", "2024-06-01 00:00:00", "--parquet", src,
                        "--doc-col", "src_doc"])
    assert got[0]["indexed"] > 0

    got = _run(capsys, ["evaluate", "-w", ws, "--dim", "16",
                        "--asof", "2024-06-01 00:00:00",
                        "--queries", "5", "-k", "3"])
    head = got[0]
    assert head["n_queries"] > 0
    for m in ("recall_at_k", "mrr", "ndcg_at_k"):
        assert 0.0 <= head[m] <= 1.0
    # per-query rows follow, one per evaluated query
    assert len(got) == 1 + head["n_queries"]
    # chunk queries should retrieve their own doc's siblings well —
    # repeated-vocabulary docs make this an easy corpus
    assert head["mrr"] > 0.5
