"""Query catalog — the driver-facing inventory.

Each entry couples (a) a PySpark implementation of an operator from
SURVEY.md §2 and (b) an equivalent ANSI-SQL oracle for DuckDB over the
same parquet fixtures. `__spark_entry__.py` re-exports these.

Determinism contract (FIXTURES.md §C): float scores are rounded to 6
decimals *before* ranking in BOTH engines; all orderings tie-break by id;
timestamps are epoch-based with the session pinned to UTC; every
time-dependent expression takes the fixed ASOF below.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .functions.text import tokens, trust_score
from .functions.vector import cosine_rounded, dot, l2_norm, query_vector_lit
from .operators import fusion, intent as intent_mod, keyword, semantic
from .operators.context import neighbor_context
from .plans.hybrid import hybrid_search

ASOF = "2024-06-01 00:00:00"  # injected clock for trust decay (Q2)
FLAGSHIP_QUERY = "how to merge fast table join"
FLAGSHIP_TERMS = ("fast", "how", "join", "merge", "table", "to")

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver invokes queries() on ITS session (entry()'s tuning may
    # not have run): pin UTC so NTZ↔TZ conversions and epoch math agree
    # with the DuckDB oracle regardless of host timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .collect()[0]
    )
    return list(row["embedding"])


# SQL fragment: cosine(embedding, query vec_id=0) rounded to 6, matching
# functions/vector.cosine_rounded structurally: dot / (l2(a) * l2(b)).
_SQL_COS_Q0 = """
    round(
      list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
         * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6)
"""


# ---------------------------------------------------------------------------
# Q1/Q2 — semantic top-k (brute-force cosine scan)  [vector_store.cpp:206-237]
# ---------------------------------------------------------------------------

@register(
    "q1_semantic_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id AS vec_id, {_SQL_COS_Q0} AS score
    FROM embeddings e, q
    ORDER BY score DESC, vec_id ASC
    LIMIT 20
    """,
)
def q1_semantic_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return semantic.semantic_topk(emb, _query_vec(spark, sf_dir), k=20)


# ---------------------------------------------------------------------------
# Q3 — keyword / FTS-analog search  [vector_store.cpp:248-275]
# ---------------------------------------------------------------------------

_SQL_TOKENS = "unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))"
_SQL_TERMS = "(" + ", ".join(f"'{t}'" for t in FLAGSHIP_TERMS) + ")"

@register(
    "q3_keyword_search",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT id, tok FROM (
        SELECT doc_id AS id, {_SQL_TOKENS} AS tok FROM documents
      ) WHERE tok IN {_SQL_TERMS}
    )
    SELECT id, count(*)::BIGINT AS match_cnt, count(*)::DOUBLE AS kw_score
    FROM toks GROUP BY id
    ORDER BY match_cnt DESC, id ASC
    LIMIT 20
    """,
)
def q3_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return keyword.keyword_search(
        docs, FLAGSHIP_QUERY, 20, id_col="doc_id", text_col="text"
    )


# ---------------------------------------------------------------------------
# Q8/Q10/Q13 — the flagship hybrid RRF plan  [vector_store.cpp:277-574]
# ---------------------------------------------------------------------------

def _hybrid_oracle(k: int = 5) -> str:
    it = intent_mod.detect_intent(FLAGSHIP_QUERY)
    r = intent_mod.route(it)
    depth = k * r.depth_mult
    bias = 1.0 * r.stability_mult * 0.1  # no log history → stability 1.0
    return f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT d.doc_id AS id, {_SQL_COS_Q0} AS sim
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id, q
    ),
    sem_ranked AS (
      SELECT id, row_number() OVER (ORDER BY sim DESC, id ASC)::BIGINT AS semantic_rank
      FROM sem QUALIFY semantic_rank <= {depth}
    ),
    kw AS (
      SELECT id, count(*)::BIGINT AS match_cnt FROM (
        SELECT DISTINCT id, tok FROM (
          SELECT doc_id AS id, {_SQL_TOKENS} AS tok FROM documents
        ) WHERE tok IN {_SQL_TERMS}
      ) GROUP BY id
    ),
    kw_ranked AS (
      SELECT id, row_number() OVER (ORDER BY match_cnt DESC, id ASC)::BIGINT AS keyword_rank
      FROM kw QUALIFY keyword_rank <= {depth}
    ),
    fused AS (
      SELECT coalesce(s.id, w.id) AS id,
             coalesce(s.semantic_rank, 0)::BIGINT AS semantic_rank,
             coalesce(w.keyword_rank, 0)::BIGINT AS keyword_rank,
             (CASE WHEN s.semantic_rank IS NOT NULL
                   THEN {r.w_semantic} * (1.0 / (60.0 + s.semantic_rank)) ELSE 0.0 END
              + CASE WHEN w.keyword_rank IS NOT NULL
                     THEN {r.w_keyword} * (1.0 / (60.0 + w.keyword_rank)) ELSE 0.0 END
              + {bias}) AS score
      FROM sem_ranked s FULL OUTER JOIN kw_ranked w ON s.id = w.id
    )
    SELECT f.id AS id, f.semantic_rank, f.keyword_rank, f.score, d.text AS text
    FROM fused f LEFT JOIN documents d ON d.doc_id = f.id
    ORDER BY f.score DESC, f.id ASC
    LIMIT {k}
    """


@register("hybrid_rrf", oracle=_hybrid_oracle())
def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    return hybrid_search(docs, emb, FLAGSHIP_QUERY, _query_vec(spark, sf_dir), k=5)


@register(
    "q3_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT id, unnest(ts) AS token FROM (
        SELECT doc_id AS id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ts
        FROM documents)
    ),
    dl AS (SELECT id, count(*)::DOUBLE AS dl FROM toks GROUP BY id),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
    hits AS (SELECT id, token FROM toks WHERE token IN {_SQL_TERMS}),
    tf AS (SELECT id, token, count(*)::DOUBLE AS tf FROM hits GROUP BY 1, 2),
    dfreq AS (SELECT token, count(*)::DOUBLE AS df FROM (
      SELECT DISTINCT id, token FROM hits) GROUP BY 1),
    scored AS (
      SELECT tf.id,
             ln((s.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
             * (tf.tf * (1.2 + 1.0))
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS term_score
      FROM tf
      JOIN dfreq USING (token)
      JOIN dl ON dl.id = tf.id
      CROSS JOIN stats s
    )
    SELECT id, round(sum(term_score), 6) AS bm25
    FROM scored GROUP BY id
    ORDER BY bm25 DESC, id ASC
    LIMIT 20
    """,
)
def q3_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword ranking — the Q3 'BM25-lite' extension SURVEY §2.4
    declares (FTS5 ranks bm25 internally; the reference flattens it)."""
    from .operators.keyword import bm25_search

    docs = _t(spark, sf_dir, "documents")
    return bm25_search(docs, FLAGSHIP_QUERY, 20, id_col="doc_id", text_col="text")


# ---------------------------------------------------------------------------
# Batch hybrid — N queries, one corpus scan per branch (set-at-a-time
# reformulation of the reference's one-query-at-a-time loop)
# ---------------------------------------------------------------------------

@register(
    "hybrid_rrf_batch",
    oracle="""
    WITH q AS (
      SELECT d.doc_id AS qid, d.text AS qtext, e.embedding AS qvec
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
      WHERE d.doc_id < 3
    ),
    sem AS (
      SELECT q.qid, d.doc_id AS id,
             round(
               list_dot_product(e.embedding::DOUBLE[], q.qvec::DOUBLE[])
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[]))), 6) AS sim
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id CROSS JOIN q
    ),
    sem_ranked AS (
      SELECT qid, id,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id ASC)::BIGINT AS semantic_rank
      FROM sem QUALIFY semantic_rank <= 20
    ),
    qt AS (
      SELECT DISTINCT qid, tok FROM (
        SELECT qid, unnest(regexp_split_to_array(lower(qtext), '[^a-z0-9]+')) AS tok FROM q
      ) WHERE tok <> ''
    ),
    dt AS (
      SELECT DISTINCT id, tok FROM (
        SELECT doc_id AS id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    matches AS (
      SELECT qt.qid, dt.id, count(*)::BIGINT AS match_cnt
      FROM dt JOIN qt USING (tok) GROUP BY 1, 2
    ),
    kw_ranked AS (
      SELECT qid, id,
             row_number() OVER (PARTITION BY qid ORDER BY match_cnt DESC, id ASC)::BIGINT AS keyword_rank
      FROM matches QUALIFY keyword_rank <= 20
    ),
    fused AS (
      SELECT coalesce(s.qid, w.qid) AS q_id, coalesce(s.id, w.id) AS id,
             coalesce(s.semantic_rank, 0)::BIGINT AS semantic_rank,
             coalesce(w.keyword_rank, 0)::BIGINT AS keyword_rank,
             (CASE WHEN s.semantic_rank IS NOT NULL
                   THEN 0.5 / (60.0 + s.semantic_rank) ELSE 0.0 END
              + CASE WHEN w.keyword_rank IS NOT NULL
                     THEN 0.5 / (60.0 + w.keyword_rank) ELSE 0.0 END
              + 0.05) AS score
      FROM sem_ranked s FULL OUTER JOIN kw_ranked w
        ON s.qid = w.qid AND s.id = w.id
    )
    SELECT q_id, id, semantic_rank, keyword_rank, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, id ASC)::BIGINT AS rank
      FROM fused) WHERE rank <= 5
    ORDER BY q_id, rank
    """,
)
def hybrid_rrf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.hybrid_batch import hybrid_search_batch

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    qset = (
        docs.filter(F.col("doc_id") < 3)
        .join(emb, docs.doc_id == emb.vec_id)
        .select(
            F.col("doc_id").alias("q_id"),
            F.col("text").alias("q_text"),
            F.col("embedding").alias("q_vec"),
        )
    )
    return hybrid_search_batch(qset, docs, emb, k=5).orderBy("q_id", "rank")


# ---------------------------------------------------------------------------
# Q2 — trust/recency decay scoring  [vector_store.cpp:221-225]
# ---------------------------------------------------------------------------

@register(
    "q2_trust_decay",
    oracle=f"""
    SELECT event_id,
           round(1.0 * greatest(0.5, 1.0 - (epoch(TIMESTAMP '{ASOF}') - epoch(ts))
                                       / (3600.0 * 24.0 * 30.0)), 6) AS trust
    FROM events
    ORDER BY event_id
    LIMIT 1000
    """,
)
def q2_trust_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime, timezone

    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    # TZ-independent asof: epoch seconds of the ASOF wall-clock in UTC
    asof_epoch = datetime.fromisoformat(ASOF).replace(tzinfo=timezone.utc).timestamp()
    asof = F.lit(float(asof_epoch))
    return (
        ev.select(
            "event_id",
            F.round(trust_score(F.lit(1.0), F.col("ts"), asof), 6).alias("trust"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


# ---------------------------------------------------------------------------
# Q4 — intent classification  [vector_store.cpp:239-246]
# ---------------------------------------------------------------------------

_SQL_INTENT = """
    CASE
      WHEN regexp_matches(lower(d.text), '\\b(what is|define|definition of|meaning of|theorem|lemma)\\b') THEN 'definition'
      WHEN regexp_matches(lower(d.text), '\\b(how to|steps to|procedure for|process of)\\b') THEN 'procedure'
      WHEN regexp_matches(lower(d.text), '\\b(summary|overview|explain chapter|summarize)\\b') THEN 'summary'
      WHEN regexp_matches(lower(d.text), '\\b(example|illustration|case study|walkthrough)\\b') THEN 'example'
      ELSE 'general'
    END
"""

@register(
    "q4_intent_classify",
    oracle=f"""
    SELECT {_SQL_INTENT} AS intent, count(*)::BIGINT AS n
    FROM documents d GROUP BY 1 ORDER BY intent
    """,
)
def q4_intent_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(intent_mod.detect_intent_col(F.col("text")).alias("intent"))
        .groupBy("intent")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("intent")
    )


# ---------------------------------------------------------------------------
# Q15 — neighbor-context window  [vector_store.cpp:687-702]
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Dedup suite — exact / n-gram Jaccard / MinHash+LSH / embedding cosine
# (training-data pipeline extensions; BASELINE.json north star)
# ---------------------------------------------------------------------------

# shared SQL fragments mirroring operators/dedup.py exactly
_SQL_SHINGLES = """
    toks AS (
      SELECT doc_id AS id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT id, array_to_string(ts[i:i+2], ' ') AS shingle
      FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
    )
"""

_SQL_JACCARD_FROM_SH = """
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT id_a, id_b,
             round(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    )
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS text_hash,
           min(doc_id) AS keeper_id,
           count(*)::BIGINT AS dup_cnt
    FROM documents GROUP BY 1
    ORDER BY keeper_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).orderBy("keeper_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SHINGLES}, {_SQL_JACCARD_FROM_SH}
    SELECT id_a, id_b, jaccard FROM jac
    WHERE jaccard >= 0.8
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8).orderBy("id_a", "id_b")


def _minhash_oracle(n_hashes: int = 16, band_size: int = 4) -> str:
    from .operators.dedup import MINHASH_PRIME, X_MOD, _affine

    mh_cols = []
    for i in range(n_hashes):
        a, b = _affine(i)
        mh_cols.append(f"min(({a} * x + {b}) % {MINHASH_PRIME}) AS mh{i}")
    band_selects = []
    for bd in range(n_hashes // band_size):
        parts = " || ',' || ".join(
            f"mh{bd * band_size + j}::VARCHAR" for j in range(band_size)
        )
        band_selects.append(
            f"SELECT id, {bd} AS band, md5({parts}) AS band_key FROM sigs"
        )
    bands_sql = " UNION ALL ".join(band_selects)
    return f"""
    WITH {_SQL_SHINGLES},
    xh AS (
      SELECT id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {X_MOD} AS x
      FROM sh
    ),
    sigs AS (SELECT id, {", ".join(mh_cols)} FROM xh GROUP BY id),
    bands AS ({bands_sql}),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
    ),
    {_SQL_JACCARD_FROM_SH}
    SELECT c.id_a, c.id_b, j.jaccard
    FROM cand c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
    WHERE j.jaccard >= 0.8
    ORDER BY c.id_a, c.id_b
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.8).orderBy("id_a", "id_b")


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) >= 0.45
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.45).orderBy("id_a", "id_b")


def _simhash_sql_core() -> str:
    from .operators.dedup import SIMHASH_BITS, X_MOD

    sums = ", ".join(
        f"sum(CASE WHEN (x >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
    toks AS (
      SELECT id, unnest(ts) AS tok FROM (
        SELECT doc_id AS id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ts
        FROM documents)
    ),
    xh AS (
      SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT % {X_MOD} AS x
      FROM toks
    ),
    sums AS (SELECT id, {sums} FROM xh GROUP BY id),
    sigs AS (SELECT id, ({sig})::BIGINT AS simhash FROM sums)
    """


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {_simhash_sql_core()}
    SELECT id AS doc_id, simhash FROM sigs ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted SimHash signature per document."""
    from .operators.dedup import simhash_signatures

    docs = _t(spark, sf_dir, "documents")
    return (
        simhash_signatures(docs)
        .select(F.col("id").alias("doc_id"), "simhash")
        .orderBy("doc_id")
    )


def _simhash_pairs_oracle() -> str:
    from .operators.dedup import SIMHASH_BITS

    band_bits, max_h = 7, 3
    n_bands = SIMHASH_BITS // band_bits
    mask = (1 << band_bits) - 1
    bands = " UNION ALL ".join(
        f"SELECT id, simhash, {b} AS band, (simhash >> {b * band_bits}) & {mask} AS band_val FROM sigs"
        for b in range(n_bands)
    )
    return f"""
    WITH {_simhash_sql_core()},
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             a.simhash AS sa, b.simhash AS sb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id
    )
    SELECT id_a, id_b, bit_count(xor(sa, sb))::BIGINT AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {max_h}
    ORDER BY id_a, id_b
    """


@register("dedup_simhash_pairs", oracle=_simhash_pairs_oracle())
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded candidates (pigeonhole over 4x7-bit
    bands covers Hamming ≤ 3) verified by bit_count(xor)."""
    from .operators.dedup import simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Text analysis suite (training-data curation extensions)
# ---------------------------------------------------------------------------

def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _text_profile_oracle() -> str:
    from .operators.textstats import BPE_TOKEN_RE, LANG_MARKERS, STOPWORDS

    bpe_re = BPE_TOKEN_RE.replace("\\\\", "\\")
    sw = _sql_list(STOPWORDS)
    lang_cols = ",\n        ".join(
        f"len(list_intersect(ts, {_sql_list(m)})) AS c_{lg}"
        for lg, m in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    lang_case = (
        "CASE "
        + " ".join(
            f"WHEN c_{lg} = {best} AND {best} > 0 THEN '{lg}'" for lg in langs
        )
        + " ELSE 'und' END"
    )
    return f"""
    WITH base AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts,
             length(text) AS n
      FROM documents
    ),
    stats AS (
      SELECT doc_id, ts, n,
        len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS ws_tokens,
        len(regexp_extract_all(text, '{bpe_re}'))::BIGINT AS bpe_tokens,
        CASE WHEN n = 0 THEN 0.0
             ELSE (n - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))::DOUBLE / n END AS praw,
        CASE WHEN len(ts) = 0 THEN 0.0
             ELSE len(list_filter(ts, x -> list_contains({sw}, x)))::DOUBLE / len(ts) END AS sraw,
        CASE WHEN len(ts) = 0 THEN 0.0
             ELSE list_aggregate(list_transform(ts, x -> length(x)), 'sum')::DOUBLE / len(ts) END AS mraw,
        {lang_cols}
      FROM base
    )
    SELECT doc_id, ws_tokens, bpe_tokens,
           round(praw, 6) AS punct_ratio,
           round(sraw, 6) AS stopword_ratio,
           round(mraw, 6) AS mean_word_len,
           round(
             0.4 * (CASE WHEN n <= 0 THEN 0.0
                         ELSE least(n::DOUBLE / 200.0, 1.0)
                              * (CASE WHEN n > 4000 THEN 0.5 ELSE 1.0 END) END)
             + 0.2 * greatest(0.0, 1.0 - praw * 4.0)
             + 0.2 * (CASE WHEN sraw >= 0.05 AND sraw <= 0.6 THEN 1.0 ELSE 0.5 END)
             + 0.2 * (CASE WHEN mraw >= 3.0 AND mraw <= 8.0 THEN 1.0 ELSE 0.5 END), 6) AS quality,
           {lang_case} AS lang_pred,
           md5(array_to_string(ts, ' ')) AS fingerprint
    FROM stats
    ORDER BY doc_id
    """


@register("text_profile", oracle=_text_profile_oracle())
def text_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import text_profile

    docs = _t(spark, sf_dir, "documents")
    return text_profile(docs).orderBy("doc_id")


@register(
    "winnowing_fingerprints",
    oracle="""
    WITH base AS (
      SELECT doc_id AS id,
             array_to_string(
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> ''), '') AS norm
      FROM documents
    ),
    grams AS (
      SELECT id, length(norm) AS len, i AS pos, substr(norm, i, 5) AS gram
      FROM base, unnest(range(1, greatest(length(norm) - 4, 0) + 1)) AS u(i)
    ),
    hashed AS (
      SELECT id, len, pos,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT % 1073741824 AS x
      FROM grams
    ),
    mins AS (
      SELECT DISTINCT id, wmin FROM (
        SELECT id, pos, len,
               min(x) OVER (PARTITION BY id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        FROM hashed)
      WHERE pos <= len - 4 - 4 + 1
    )
    SELECT id, count(*)::BIGINT AS n_fingerprints,
           md5(string_agg(wmin::VARCHAR, ',' ORDER BY wmin)) AS digest
    FROM mins GROUP BY id
    ORDER BY id
    """,
)
def winnowing_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing fingerprints (rolling k-gram window minima):
    the document-fingerprinting scale op (k=5, w=4)."""
    from .operators.textstats import winnowing_fingerprints

    docs = _t(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs).orderBy("id")


# ---------------------------------------------------------------------------
# Similarity search — multi-query brute-force kNN (exact); ANN paths are
# recall-tested in tests/ (approximate results have no equality oracle)
# ---------------------------------------------------------------------------

@register(
    "knn_multi",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, e.vec_id,
             round(
               list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6) AS score
      FROM embeddings e CROSS JOIN q
    )
    SELECT q_id, vec_id, score,
           row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC)::BIGINT AS knn_rank
    FROM scored
    QUALIFY knn_rank <= 5
    ORDER BY q_id, knn_rank
    """,
)
def knn_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return semantic.knn_join(qs, emb, k=5).orderBy("q_id", "knn_rank")


# ---------------------------------------------------------------------------
# Q9 / Q10 / Q16 — intent boosts, stability bias, source-context assembly
# ---------------------------------------------------------------------------

_SQL_CHUNK_TYPE_SYN = """
    CASE WHEN doc_id % 7 = 0 THEN 'definition'
         WHEN doc_id % 7 = 1 THEN 'summary'
         WHEN doc_id % 7 = 2 THEN 'list'
         WHEN doc_id % 7 = 3 THEN 'example'
         ELSE 'text' END
"""


@register(
    "q9_intent_boost",
    oracle=f"""
    SELECT doc_id AS id,
           ({_SQL_CHUNK_TYPE_SYN}) AS chunk_type,
           (0.5 * (1.0 / (60.0 + (doc_id % 20) + 1))
            + CASE WHEN ({_SQL_CHUNK_TYPE_SYN}) = 'definition' THEN 0.5 ELSE 0.0 END
           ) AS boosted_score
    FROM documents ORDER BY doc_id
    """,
)
def q9_intent_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 additive intent-type boost (`vector_store.cpp:402-409`) for a
    'definition' intent over synthetic chunk types + synthetic ranks."""
    from .operators.fusion import intent_boost_col

    docs = _t(spark, sf_dir, "documents")
    ct = (
        F.when(F.col("doc_id") % 7 == 0, "definition")
        .when(F.col("doc_id") % 7 == 1, "summary")
        .when(F.col("doc_id") % 7 == 2, "list")
        .when(F.col("doc_id") % 7 == 3, "example")
        .otherwise("text")
    )
    base = F.lit(0.5) * (F.lit(1.0) / (F.lit(60.0) + (F.col("doc_id") % 20) + 1))
    out = docs.select(
        F.col("doc_id").alias("id"),
        ct.alias("chunk_type"),
        (base + intent_boost_col("definition", ct, F.lit(0))).alias("boosted_score"),
    )
    return out.orderBy("id")


@register(
    "q10_stability_bias",
    oracle="""
    SELECT event_type AS query,
           greatest(0.0, 1.0 - avg(abs(floor(value * 10)::BIGINT % 7 - 3)) / 5.0) AS stability
    FROM events
    WHERE event_id % 5 <> 0
    GROUP BY event_type ORDER BY query
    """,
)
def q10_stability_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 rank-stability aggregate (`vector_store.cpp:430-441`): the
    events table stands in for retrieval_logs (query=event_type,
    rank_delta derived, exploration rows excluded)."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    delta = F.floor(F.col("value") * 10).cast("long") % 7 - 3
    return (
        ev.filter(F.col("event_id") % 5 != 0)
        .groupBy(F.col("event_type").alias("query"))
        .agg(
            F.greatest(
                F.lit(0.0), F.lit(1.0) - F.avg(F.abs(delta)) / F.lit(5.0)
            ).alias("stability")
        )
        .orderBy("query")
    )


@register(
    "q16_source_context",
    oracle="""
    SELECT doc_id,
           doc_id::VARCHAR || '_' || (doc_id % 100)::VARCHAR AS context_chunk_id,
           'synthesis' AS retrieval_stage,
           string_agg(text, ' \n') OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS context
    FROM documents
    ORDER BY doc_id
    """,
)
def q16_source_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 context assembly (`vector_store.cpp:706-748`): synthesis stage
    widens the neighbor frame to ≥3 ('Dynamic Context Packing') and tags
    a composite chunk id."""
    from .operators.context import source_context

    docs = _t(spark, sf_dir, "documents").withColumn(
        "chunk_idx", (F.col("doc_id") % 100).cast("int")
    )
    out = source_context(
        docs, offset=1, stage="synthesis",
        doc_col="source", idx_col="doc_id", text_col="text",
    )
    return out.select(
        "doc_id",
        F.concat_ws(
            "_", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string")
        ).alias("context_chunk_id"),
        "retrieval_stage",
        "context",
    ).orderBy("doc_id")


@register(
    "quantize_roundtrip",
    oracle="""
    WITH q AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale
      FROM embeddings
    ),
    recon AS (
      SELECT vec_id, embedding,
             CASE WHEN scale = 0
                  THEN list_transform(embedding, x -> 0.0)
                  ELSE list_transform(embedding, x -> round(x::DOUBLE / scale) * scale)
             END AS r
      FROM q
    )
    SELECT vec_id,
           round(
             list_dot_product(embedding::DOUBLE[], r)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(r, r))), 6) AS cos_recon
    FROM recon ORDER BY vec_id
    """,
)
def quantize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric quantization round-trip quality (4x storage cut;
    scale path for the 12KB/row float32 BLOBs the reference ships)."""
    from .operators.quantize import reconstruction_report

    emb = _t(spark, sf_dir, "embeddings")
    return reconstruction_report(emb).orderBy("vec_id")


@register("ann_lsh_topk")
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH (scale path for Q1).
    Rows-only: ANN results are approximate by contract; recall vs brute
    force is asserted in tests/test_similarity_ann.py."""
    from .operators.similarity import ann_lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, _query_vec(spark, sf_dir), k=10, dim=64, n_planes=4, n_tables=8)


@register("ann_ivf_topk")
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF cells (rows-only; recall tested)."""
    from .operators.similarity import ivf_assign, ivf_topk, sample_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = sample_centroids(emb, 16)
    assign = ivf_assign(emb, cents)
    return ivf_topk(emb, _query_vec(spark, sf_dir), k=10, centroids=cents, assignments=assign, n_probe=4)


# ---------------------------------------------------------------------------
# Relational coverage (§2.8: joins / aggregations / windows / sort-limit)
# over the TPC-H-ish tables. Double sums go through DECIMAL so the result
# is independent of accumulation order (engine- and partition-stable).
# ---------------------------------------------------------------------------

@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))::DOUBLE AS sum_disc_price,
           sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)))::DOUBLE AS sum_charge,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(disc.cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))::DOUBLE AS revenue,
           epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate_epoch ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    The customer filter reduces to ~1/5 of customers; Catalyst pushes the
    segment predicate into the parquet scan and AQE picks broadcast for
    the filtered side."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate")
            .cast("timestamp")
            .cast("double")
            .cast("long")
            .alias("o_orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate_epoch").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC)::BIGINT AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    )


@register(
    "star_join_revenue",
    oracle="""
    SELECT n_name, r_name,
           sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS revenue,
           count(*)::BIGINT AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    ORDER BY n_name, r_name
    """,
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_orders"),
        )
        .orderBy("n_name", "r_name")
    )


@register(
    "distinct_agg_per_nation",
    oracle="""
    SELECT n_name,
           count(DISTINCT o_custkey)::BIGINT AS n_active_customers,
           count(*)::BIGINT AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def distinct_agg_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand-based two-phase plan in Spark)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_active_customers"),
            F.count("*").cast("long").alias("n_orders"),
        )
        .orderBy("n_name")
    )


@register(
    "semi_anti_join_customers",
    oracle="""
    SELECT 'with_orders' AS cohort, count(*)::BIGINT AS n FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders' AS cohort, count(*)::BIGINT AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY cohort
    """,
)
def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit left-semi / left-anti joins (the FTS `id IN (subquery)`
    pattern of `vector_store.cpp:251-252`, relational form)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    semi = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    out = semi.agg(F.count("*").cast("long").alias("n")).select(
        F.lit("with_orders").alias("cohort"), "n"
    ).unionByName(
        anti.agg(F.count("*").cast("long").alias("n")).select(
            F.lit("without_orders").alias("cohort"), "n"
        )
    )
    return out.orderBy("cohort")


@register(
    "tpch_q5_region_volume",
    oracle="""
    SELECT n_name,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))::DOUBLE AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def tpch_q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join chain with a region filter that
    prunes through two broadcast dims before touching the fact table."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
           count(*)::BIGINT AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — beyond the reference's surface
    (§2.8 notes it has no grouping sets), table stakes for an analytics
    engine. Spark plans this as a single Expand + aggregate pass."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "pivot_status_qty",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END)::DOUBLE AS qty_o,
           sum(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END)::DOUBLE AS qty_f
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) — Spark's pivot() with pinned values so
    no extra distinct-scan pass; oracle is the CASE-aggregation form."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_o"),
        F.col("F").alias("qty_f"),
    ).orderBy("l_returnflag")


@register(
    "mode_per_group",
    oracle="""
    SELECT p_brand, p_size AS mode_size, cnt FROM (
      SELECT p_brand, p_size, cnt,
             row_number() OVER (PARTITION BY p_brand ORDER BY cnt DESC, p_size ASC) AS rn
      FROM (SELECT p_brand, p_size, count(*)::BIGINT AS cnt FROM part GROUP BY 1, 2))
    WHERE rn = 1
    ORDER BY p_brand
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7 analog — per-page baseline font = most frequent value
    (`pdf_processor.cpp:242-251`), expressed as count + row_number."""
    part = _t(spark, sf_dir, "part")
    counts = part.groupBy("p_brand", "p_size").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("p_brand").orderBy(F.col("cnt").desc(), F.col("p_size").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_size").alias("mode_size"), "cnt")
        .orderBy("p_brand")
    )


@register(
    "events_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, r.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it (composed from union + ordered window — Spark has no
    native as-of; DuckDB's ASOF JOIN is the oracle)."""
    from .operators.asof import asof_join
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, key="user_id", ts_col="ts",
        right_value_col="value", out_col="asof_value",
    )
    return out.select("event_id", "user_id", "asof_value").orderBy("event_id")


# ---------------------------------------------------------------------------
# Events: sessionization + tumbling-window aggregation (batch analogs of
# the streaming path; reference analog = per-page incremental emission,
# `pdf_processor.cpp:396-404`)
# ---------------------------------------------------------------------------

@register(
    "events_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch(ts) AS sec, value FROM events
    ),
    gaps AS (
      SELECT user_id, event_id, sec, value,
             CASE WHEN lag(sec) OVER w IS NULL
                       OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sess AS (
      SELECT user_id, sec, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           count(*)::BIGINT AS n_events,
           round(max(sec) - min(sec), 6) AS duration_sec,
           sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS sum_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    sec = F.col("ts").cast("double")
    w = Window.partitionBy("user_id").orderBy(F.col("sec").asc(), F.col("event_id").asc())
    gaps = ev.select("user_id", "event_id", sec.alias("sec"), "value").withColumn(
        "new_sess",
        F.when(
            F.lag("sec").over(w).isNull() | (F.col("sec") - F.lag("sec").over(w) > 1800),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.max("sec") - F.min("sec"), 6).alias("duration_sec"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "events_tumbling_window",
    oracle="""
    SELECT (floor(epoch(ts) / 300) * 300)::BIGINT AS window_start_epoch,
           event_type,
           count(*)::BIGINT AS n,
           sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    win = (F.floor(F.col("ts").cast("double") / 300) * 300).cast("long")
    return (
        ev.groupBy(win.alias("window_start_epoch"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("window_start_epoch", "event_type")
    )


# ---------------------------------------------------------------------------
# Ingestion ETL (SURVEY §2.1) — the PDF-layout operators exercised over a
# deterministic synthetic line fixture derived from `part` (25 brands as
# docs, 6 slots/page: header, heading, 2 body lines, a bullet line, a
# bare page number). Geometry puts slot 0 in the top margin band and the
# page number in the bottom band, so I2/I3 have real work to do.
# ---------------------------------------------------------------------------

PAGE_H = 792.0

_SQL_SYN_LINES = """
    syn AS (
      SELECT p_brand AS doc,
             row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) - 1 AS i,
             p_name
      FROM part
    ),
    lines AS (
      SELECT doc, i,
             (i // 6 + 1)::INT AS page,
             (792.0 - 40.0 - (i % 6) * 142.0)::DOUBLE AS top,
             CASE WHEN i % 6 = 0 THEN 'Quarterly Report Draft'
                  WHEN i % 6 = 5 THEN (i // 6 + 1)::VARCHAR
                  WHEN i % 6 = 4 THEN '- ' || p_name
                  ELSE p_name END AS text,
             CASE WHEN i % 6 = 1 THEN
                    CASE WHEN (i // 6 + 1) % 3 = 0 THEN 16.0
                         WHEN (i // 6 + 1) % 3 = 1 THEN 13.0
                         ELSE 12.0 END
                  ELSE 10.0 END AS font_size,
             CASE WHEN i % 6 = 1 THEN 700 ELSE 400 END AS font_weight
      FROM syn
    )
"""

_SQL_FILTERED_LINES = """
    freqs AS (
      SELECT doc, trim(regexp_replace(lower(text), '[0-9]', '', 'g')) AS norm,
             count(*) AS freq
      FROM lines
      WHERE length(trim(regexp_replace(lower(text), '[0-9]', '', 'g'))) > 3
      GROUP BY 1, 2
    ),
    filtered AS (
      SELECT l.*
      FROM lines l
      LEFT JOIN freqs f
        ON f.doc = l.doc
       AND f.norm = trim(regexp_replace(lower(l.text), '[0-9]', '', 'g'))
      WHERE NOT (length(trim(regexp_replace(lower(l.text), '[0-9]', '', 'g'))) > 3
                 AND coalesce(f.freq, 0) > 5
                 AND (l.top > 792.0 * 0.85 OR l.top < 792.0 * 0.15))
        AND NOT (length(l.text) < 5 AND regexp_matches(l.text, '^\\s*[0-9]+\\s*$'))
    )
"""


def _synthetic_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_partkey")
    i = (F.row_number().over(w) - 1).cast("long")
    base = part.select(F.col("p_brand").alias("doc"), F.col("p_name"), i.alias("i"))
    slot = F.col("i") % 6
    page = (F.floor(F.col("i") / 6) + 1).cast("int")
    return base.select(
        "doc",
        "i",
        page.alias("page"),
        (F.lit(PAGE_H) - 40.0 - slot.cast("double") * 142.0).alias("top"),
        F.when(slot == 0, "Quarterly Report Draft")
        .when(slot == 5, page.cast("string"))
        .when(slot == 4, F.concat(F.lit("- "), F.col("p_name")))
        .otherwise(F.col("p_name"))
        .alias("text"),
        F.when(
            slot == 1,
            F.when(page % 3 == 0, 16.0).when(page % 3 == 1, 13.0).otherwise(12.0),
        )
        .otherwise(10.0)
        .alias("font_size"),
        F.when(slot == 1, 700).otherwise(400).alias("font_weight"),
    )


def _filtered_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ingest import filter_noise_lines

    return filter_noise_lines(_synthetic_lines(spark, sf_dir), PAGE_H)


@register(
    "ingest_noise_filter",
    oracle=f"""
    WITH {_SQL_SYN_LINES}, {_SQL_FILTERED_LINES}
    SELECT doc, i, text FROM filtered ORDER BY doc, i
    """,
)
def ingest_noise_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 header/footer frequency filter + I3 bare-page-number filter
    (`pdf_processor.cpp:33-64,189-201`)."""
    return _filtered_lines(spark, sf_dir).select("doc", "i", "text").orderBy("doc", "i")


@register(
    "ingest_heading_levels",
    oracle=f"""
    WITH {_SQL_SYN_LINES}, {_SQL_FILTERED_LINES},
    counts AS (
      SELECT doc, page, font_size::INT AS fsz, count(*) AS cnt
      FROM filtered GROUP BY 1, 2, 3
    ),
    base AS (
      SELECT doc, page, fsz::DOUBLE AS baseline FROM (
        SELECT doc, page, fsz, row_number() OVER (
          PARTITION BY doc, page ORDER BY cnt DESC, fsz ASC) AS rn
        FROM counts) WHERE rn = 1
    )
    SELECT f.doc, f.i,
      (CASE
        WHEN (regexp_matches(trim(f.text), '^(Chapter|PART)\\s+([0-9]+)', 'i')
              OR (f.font_size >= b.baseline + 2.0 AND length(f.text) < 120
                  AND f.font_size >= b.baseline + 6.0))
             AND length(trim(f.text)) < 100 THEN 1
        WHEN (regexp_matches(trim(f.text), '^([0-9]+\\.[0-9]+)\\s+(.*)')
              OR (f.font_size >= b.baseline + 2.0 AND length(f.text) < 120
                  AND f.font_size >= b.baseline + 3.0))
             AND length(trim(f.text)) < 120 THEN 2
        WHEN (regexp_matches(trim(f.text), '^([0-9]+\\.[0-9]+\\.[0-9]+)\\s+(.*)')
              OR (f.font_size >= b.baseline + 2.0 AND length(f.text) < 120
                  AND f.font_weight > 600))
             AND length(trim(f.text)) < 150 THEN 3
        ELSE 0 END)::INT AS heading_level
    FROM filtered f JOIN base b ON b.doc = f.doc AND b.page = f.page
    ORDER BY f.doc, f.i
    """,
)
def ingest_heading_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7 baseline font (mode) + I8 heading level rules
    (`pdf_processor.cpp:242-289`). n_lines=1 for the line fixture."""
    from .operators.ingest import baseline_font, heading_level_col

    fl = _filtered_lines(spark, sf_dir)
    base = baseline_font(fl, doc_col="doc", page_col="page")
    joined = fl.join(base, ["doc", "page"])
    return joined.select(
        "doc",
        "i",
        heading_level_col(
            F.col("text"), F.col("font_size"), F.col("font_weight"), F.lit(1), F.col("baseline")
        ).alias("heading_level"),
    ).orderBy("doc", "i")


@register(
    "ingest_chunk_types",
    oracle=f"""
    WITH {_SQL_SYN_LINES}, {_SQL_FILTERED_LINES},
    feats AS (
      SELECT doc, i, text, trim(text) AS p,
             length(text) - length(regexp_replace(text, '[{{}};()#<>:=-]', '', 'g')) AS symbols,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS nums,
             length(text) - length(regexp_replace(text, '\\.', '', 'g')) AS periods
      FROM filtered
    )
    SELECT doc, i,
      CASE
        WHEN (CASE WHEN symbols > 2 THEN 4 ELSE 0 END
              + CASE WHEN regexp_matches(p, '\\b(int|class|public|void|return|const|template|static|if|else|for|while)\\b') THEN 3 ELSE 0 END
              + CASE WHEN text LIKE '    %' OR text LIKE chr(9) || '%' THEN 3 ELSE 0 END) >= 5
          THEN 'code'
        WHEN nums > 3 AND periods < 0.5 THEN 'table'
        WHEN p LIKE '•%' OR p LIKE '-%' OR p LIKE '*%' THEN 'list'
        WHEN regexp_matches(p, '^([0-9]+|[a-zA-Z])\\)') THEN 'list'
        WHEN regexp_extract(p, '(?i)(Definition|Theorem|Lemma|Corollary)[:\\s+]', 1) <> ''
             AND strpos(p, regexp_extract(p, '(?i)(Definition|Theorem|Lemma|Corollary)[:\\s+]', 1)) <= 5
          THEN 'definition'
        WHEN regexp_extract(p, '(?i)^(Definition|Example|Theorem|Summary|Exercise|Corollary|Lemma|Proof)[:\\s+]', 1) <> ''
          THEN lower(regexp_extract(p, '(?i)^(Definition|Example|Theorem|Summary|Exercise|Corollary|Lemma|Proof)[:\\s+]', 1))
        ELSE 'text' END AS chunk_type
    FROM feats
    ORDER BY doc, i
    """,
)
def ingest_chunk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I9 chunk-type classifier (`pdf_processor.cpp:298-333`) as a pure
    expression; n_lines=1 per synthetic line."""
    from .operators.ingest import SYMBOL_CLASS, chunk_type_col

    fl = _filtered_lines(spark, sf_dir)
    symbols = F.length("text") - F.length(F.regexp_replace("text", SYMBOL_CLASS, ""))
    nums = F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    return fl.select(
        "doc",
        "i",
        chunk_type_col(F.col("text"), F.lit(1), symbols, nums).alias("chunk_type"),
    ).orderBy("doc", "i")


@register(
    "i12_doc_identity",
    oracle="""
    SELECT doc_id, md5(source || '_' || n_chars::VARCHAR) AS doc_md5
    FROM documents ORDER BY doc_id
    """,
)
def i12_doc_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ingest import doc_identity

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", doc_identity(F.col("source"), F.col("n_chars")).alias("doc_md5")
    ).orderBy("doc_id")


@register(
    "i15_section_agg",
    oracle="""
    SELECT source,
           length(substr(string_agg(text, chr(10) ORDER BY doc_id), 1, 5000))::BIGINT AS section_chars,
           substr(string_agg(text, chr(10) ORDER BY doc_id), 1, 200) AS summary
    FROM documents GROUP BY source ORDER BY source
    """,
)
def i15_section_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I15 section aggregation for summaries (`mainwindow.cpp:263-267,
    763-801`): ordered concat per section, first 5000 chars to the
    summarizer; the summarizer itself is a pluggable UDF — here the
    deterministic stub (first 200 chars), as FIXTURES.md §C prescribes."""
    docs = _t(spark, sf_dir, "documents")
    ordered_concat = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda s: s["text"],
        ),
        "\n",
    )
    agg = docs.groupBy("source").agg(ordered_concat.alias("all_text"))
    section = F.substring(F.col("all_text"), 1, 5000)
    return agg.select(
        "source",
        F.length(section).cast("long").alias("section_chars"),
        F.substring(section, 1, 200).alias("summary"),
    ).orderBy("source")


@register("ingest_chunker")
def ingest_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I10 greedy chunker (`pdf_processor.cpp:259-389`) — sequential
    accumulate/split/overlap per doc via applyInPandas; docs parallelize.
    No SQL oracle (stateful loop semantics); rows-only driver check +
    golden unit tests in tests/test_ingest.py."""
    from .operators.ingest import baseline_font, chunk_documents

    # persist: the synthetic-lines + noise-filter lineage feeds BOTH the
    # baseline-font aggregate and the chunker scan
    fl = _filtered_lines(spark, sf_dir).persist()
    blocks = fl.select(
        "doc",
        "page",
        F.col("i").alias("ord"),
        "text",
        "font_size",
        "font_weight",
        F.lit(1).alias("n_lines"),
        F.lit(0).alias("symbols"),
        F.lit(0).alias("nums"),
    )
    base = baseline_font(blocks, doc_col="doc", page_col="page")
    return chunk_documents(blocks, baselines=base).orderBy("doc", "chunk_idx")


# ---------------------------------------------------------------------------
# Rerank + synthesis (R1-R5, Y1-Y3) — driver-sized sequential ops; the
# scalable clustering variant is oracle-checked via a recursive CTE
# ---------------------------------------------------------------------------

@register(
    "y1_cluster_components",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(
          list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
          6) >= 0.45
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(s, d) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON e.s = r.d
    )
    SELECT s AS id, min(d)::BIGINT AS cluster_id
    FROM reach GROUP BY s ORDER BY id
    """,
)
def y1_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y1 at corpus scale: single-link clusters over cos>threshold edges
    via iterative min-label propagation (driver-greedy variant for the
    ≤5-context per-query path is operators/synthesis.greedy_cluster,
    reference `gemini_api.cpp:390-409`)."""
    from .operators.synthesis import cluster_embeddings_df

    emb = _t(spark, sf_dir, "embeddings")
    return cluster_embeddings_df(emb, threshold=0.45).orderBy("id")


@register("rerank_pipeline")
def rerank_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1+R2+R5: hybrid top-10 → stub cross-encoder scores → calibration
    → merge-back top-5 (`gemini_api.cpp:79-178,741-781`). Driver-side over
    10 rows by design (the reference ships them in one LLM prompt);
    rows-only check — the LLM scorer has no SQL analog."""
    from .operators.rerank import Calibrator, rerank_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    cands = hybrid_search(
        docs, emb, FLAGSHIP_QUERY, _query_vec(spark, sf_dir), k=10
    )
    cal = Calibrator(mean=0.3, std=0.2, sample_count=10)
    return rerank_topk(cands, FLAGSHIP_QUERY, topk=5, n_in=10, calibrator=cal)


@register("synthesis_claims")
def synthesis_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y1→Y3 deep-dive: top-5 hybrid results → neighbor-context windows
    (Q16) → greedy fact clustering → stub synthesis → validated claims
    (`mainwindow.cpp:804-824`, `gemini_api.cpp:379-567`). Rows-only."""
    from .operators.synthesis import SourceContext, synthesize

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    top = hybrid_search(docs, emb, FLAGSHIP_QUERY, _query_vec(spark, sf_dir), k=5)
    rows = top.collect()
    vec_map = {
        r["id"]: list(r["v"])
        for r in emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        .join(F.broadcast(top.select("id")), "id", "left_semi")
        .collect()
    }
    ctxs = [
        SourceContext(
            prompt_index=i + 1,
            doc_name=str(r["id"]),
            trust_score=1.0,
            chunk_text=(r["text"] or "")[:200],
            final_score=r["score"],
            embedding=vec_map.get(r["id"], []),
        )
        for i, r in enumerate(rows)
    ]
    claims = synthesize(FLAGSHIP_QUERY, ctxs)
    out = [
        (c.statement, ",".join(map(str, c.source_indices)), float(c.confidence))
        for c in claims
    ]
    return spark.createDataFrame(
        out, "statement string, sources string, confidence double"
    )


@register(
    "q15_context_window",
    oracle="""
    SELECT doc_id,
           string_agg(text, ' \n') OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS context
    FROM documents
    ORDER BY doc_id
    """,
)
def q15_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = neighbor_context(
        docs, 2, doc_col="source", idx_col="doc_id", text_col="text"
    )
    return out.select("doc_id", "context").orderBy("doc_id")
