"""Q3 — keyword (FTS analog) search + the derived inverted index.

Reference: SQLite FTS5 virtual table `embeddings_fts` + semi-join
`WHERE id IN (SELECT rowid ... MATCH :q)` with flat score 0.5
(`vector_store.cpp:89,248-275`). Spark-first replacement: the inverted
index is a *derived DataFrame* (token, id) built by explode — not a
dual-written side structure — and the MATCH is a join against the query's
token set. We score by the number of distinct query terms matched
(match_cnt; a declared upgrade over the reference's flat 0.5 — SURVEY
§2.4 Q3), with the flat-score mode available for strict parity.

Scale notes: the query-term set is tiny → Catalyst broadcasts it, so the
"index probe" is a map-side hash semi-join over the token scan; the
groupBy(id) agg is partial-aggregated map-side. At 100 TB you'd persist
fts_index partitioned/bucketed by token so a term probe prunes to a few
buckets instead of scanning all postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens


def build_fts_index(
    chunks: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    heading_col: str | None = None,
) -> DataFrame:
    """Inverted index (token, id), distinct. When a heading column is given
    its tokens are indexed too — the reference's `[CONTEXT: <heading>]`
    augmentation (`vector_store.cpp:195-200`)."""
    body = F.col(text_col)
    if heading_col is not None:
        body = F.concat_ws(" ", F.coalesce(F.col(heading_col), F.lit("")), body)
    return (
        chunks.select(F.col(id_col).alias("id"), F.explode(tokens(body)).alias("token"))
        .distinct()
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(
    chunks: DataFrame,
    query_text: str,
    limit: int,
    id_col: str = "id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 ranking — the "BM25-lite" extension SURVEY §2.4 declares for
    Q3 (the reference's FTS5 scores a flat 0.5; FTS5 itself ranks bm25
    internally, so this is the faithful upgrade).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf = ln( (N − df + 0.5)/(df + 0.5) + 1 ).

    Plan shape: one token explode, query-term In-filter BEFORE any
    aggregation, df/tf from map-side-combined groupBys, N and avgdl as
    broadcast scalars. Shuffles are keyed by token (bounded by query
    terms) and by doc id (matched docs only).
    """
    import re

    terms = sorted(set(t for t in re.split(r"[^a-z0-9]+", query_text.lower()) if t))
    toks = chunks.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    # doc lengths + corpus stats (tiny aggregates, computed once)
    dl = toks.groupBy("id").agg(F.count("*").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])

    hits = toks.filter(F.col("token").isin(terms))
    tf = hits.groupBy("id", "token").agg(F.count("*").cast("double").alias("tf"))
    df_ = hits.select("id", "token").distinct().groupBy("token").agg(
        F.count("*").cast("double").alias("df")
    )
    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "id")
        .select(
            "id",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("id").asc())
        .limit(limit)
    )


def phrase_search(
    chunks: DataFrame,
    phrase: str,
    limit: int,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """FTS5 phrase-MATCH parity (`vector_store.cpp:251-262`: a quoted
    FTS5 query matches consecutive tokens): ids whose token stream
    contains the query tokens ADJACENTLY, with the occurrence count.
    Columns (id, phrase_cnt, kw_score) — kw_score flat 0.5 like the
    reference's FTS branch.

    Shape: one posexplode scan; per (id, token-of-phrase) the positions
    aggregate into arrays, and adjacency is a pure array expression —
    positions of term k, shifted by −k, intersected across terms (a
    match start is a position present in every shifted set). Only
    postings of the phrase's terms ever shuffle."""
    import re

    terms = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("empty phrase")
    postings = chunks.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    ).filter(F.col("token").isin(sorted(set(terms))))
    per_term = postings.groupBy("id", "token").agg(
        F.collect_list("pos").alias("ps")
    )
    byid = per_term.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("token", "ps"))).alias("tp")
    )
    starts = F.coalesce(F.col("tp")[terms[0]], F.array().cast("array<int>"))
    for k, t in enumerate(terms[1:], start=1):
        nxt = F.coalesce(F.col("tp")[t], F.array().cast("array<int>"))
        # NB: the lambda must be unary — a second parameter would be
        # interpreted by transform() as the element INDEX. The expression
        # tree is built eagerly, so closing over the loop variable is safe.
        shift = F.lit(int(k))
        starts = F.array_intersect(starts, F.transform(nxt, lambda p: p - shift))
    return (
        byid.withColumn("phrase_cnt", F.size(starts).cast("long"))
        .filter(F.col("phrase_cnt") > 0)
        .select("id", "phrase_cnt", F.lit(0.5).alias("kw_score"))
        .orderBy(F.col("phrase_cnt").desc(), F.col("id").asc())
        .limit(limit)
    )


def prefix_search(
    chunks: DataFrame,
    query_text: str,
    limit: int,
    id_col: str = "id",
    text_col: str = "text",
    fts_index: DataFrame | None = None,
) -> DataFrame:
    """FTS5 prefix-MATCH parity (`vector_store.cpp:251-262`: FTS5 MATCH
    accepts `tok*` prefix terms). Query terms ending in `*` match any
    token with that prefix; bare terms match exactly. match_cnt counts
    distinct QUERY TERMS matched (a doc with 50 tokens starting `merg`
    still scores 1 for `merg*`), ranked desc then id asc — the same
    ranking contract as keyword_search. Columns (id, match_cnt,
    kw_score).

    Plan shape: the OR of equality/StartsWith predicates filters the
    posting scan BEFORE any shuffle; on a materialized fts_index both
    predicate kinds push into the parquet scan (EqualTo /
    StringStartsWith are pushable filters). Per-term hit flags come from
    ONE groupBy(id) with a max() per term — no per-term joins."""
    import re

    raw = [t for t in re.split(r"[^a-z0-9*]+", query_text.lower()) if t.rstrip("*")]
    specs: list[tuple[str, bool]] = []
    seen = set()
    for t in raw:
        key = (t.rstrip("*"), t.endswith("*"))
        if key not in seen:
            seen.add(key)
            specs.append(key)
    specs.sort()
    if not specs:
        raise ValueError("empty prefix query")
    if fts_index is not None:
        postings = fts_index
    else:
        postings = chunks.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        ).distinct()
    preds = [
        F.col("token").startswith(base) if is_pref else (F.col("token") == base)
        for base, is_pref in specs
    ]
    any_pred = preds[0]
    for p in preds[1:]:
        any_pred = any_pred | p
    flags = [
        F.max(F.when(p, F.lit(1)).otherwise(F.lit(0))).alias(f"_m{i}")
        for i, p in enumerate(preds)
    ]
    matched = postings.filter(any_pred).groupBy("id").agg(*flags)
    total = F.col("_m0")
    for i in range(1, len(preds)):
        total = total + F.col(f"_m{i}")
    return (
        matched.withColumn("match_cnt", total.cast("long"))
        .select("id", "match_cnt", F.col("match_cnt").cast("double").alias("kw_score"))
        .orderBy(F.col("match_cnt").desc(), F.col("id").asc())
        .limit(limit)
    )


def boolean_search(
    chunks: DataFrame,
    query_text: str,
    limit: int,
    id_col: str = "id",
    text_col: str = "text",
    fts_index: DataFrame | None = None,
) -> DataFrame:
    """FTS5 boolean-MATCH parity (`vector_store.cpp:251-262`: FTS5 MATCH
    accepts `a AND b OR c NOT d`). Parser subset: uppercase AND/OR/NOT
    keywords, FTS5 precedence NOT > AND > OR, no parentheses — the query
    normalizes to OR-of-AND-groups where each group has positive terms
    and NOT-negated terms; `tok*` prefix terms are allowed anywhere a
    term is (matched via StartsWith, like prefix_search). A doc matches a group when every positive
    term is present and no negated term is; hit_groups counts matching
    groups (ranking signal), kw_score stays flat 0.5 like the
    reference's FTS branch. Columns (id, hit_groups, kw_score).

    Plan shape: ONE posting scan In-filtered to every referenced term
    (positive or negated) before any shuffle, one groupBy(id) producing
    a presence flag per term; the boolean structure is then a pure
    column expression over the flags — no per-group or per-term joins,
    no second scan for the negations."""
    groups: list[tuple[list[str], list[str]]] = [([], [])]
    negate = False
    for tok in query_text.split():
        if tok == "OR":
            groups.append(([], []))
            negate = False
        elif tok == "AND":
            negate = False
        elif tok == "NOT":
            negate = True
        else:
            is_pref = tok.endswith("*")
            t = "".join(ch for ch in tok.lower() if ch.isalnum())
            if t:
                # FTS5 allows prefix terms inside boolean expressions:
                # `merg* NOT unrelated` — keep the star as a term kind
                groups[-1][1 if negate else 0].append((t, is_pref))
            negate = False
    groups = [(p, n) for p, n in groups if p]
    if not groups:
        raise ValueError("boolean query needs at least one positive term")
    terms = sorted({t for p, n in groups for t in p + n})
    idx_of = {t: i for i, t in enumerate(terms)}
    if fts_index is not None:
        postings = fts_index
    else:
        postings = chunks.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        ).distinct()
    preds = [
        F.col("token").startswith(base) if is_pref else (F.col("token") == base)
        for base, is_pref in terms
    ]
    any_pred = preds[0]
    for p in preds[1:]:
        any_pred = any_pred | p
    flags = [
        F.max(F.when(p, F.lit(1)).otherwise(F.lit(0))).alias(f"_f_{i}")
        for i, p in enumerate(preds)
    ]
    byid = postings.filter(any_pred).groupBy("id").agg(*flags)

    def group_match(pos: list, neg: list):
        cond = F.lit(True)
        for t in pos:
            cond = cond & (F.col(f"_f_{idx_of[t]}") == 1)
        for t in neg:
            cond = cond & (F.col(f"_f_{idx_of[t]}") == 0)
        return cond

    hit = F.lit(0)
    for p, n in groups:
        hit = hit + F.when(group_match(p, n), F.lit(1)).otherwise(F.lit(0))
    return (
        byid.withColumn("hit_groups", hit.cast("long"))
        .filter(F.col("hit_groups") > 0)
        .select("id", "hit_groups", F.lit(0.5).alias("kw_score"))
        .orderBy(F.col("hit_groups").desc(), F.col("id").asc())
        .limit(limit)
    )


def near_search(
    chunks: DataFrame,
    query_text: str,
    limit: int,
    n: int = 10,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """FTS5 NEAR-MATCH parity (`vector_store.cpp:251-262`: FTS5 MATCH
    accepts `NEAR(a b, N)`): ids where every query term occurs with at
    most `n` intervening tokens — i.e. some choice of one position per
    term spans ≤ n + k − 1 token slots (k = #terms; n=10 is FTS5's
    default). near_cnt counts the distinct window-start positions s
    (s itself a posting of some term) whose window [s, s+n+k−1] contains
    all terms — a deterministic, order-independent count the SQL oracle
    reproduces. Columns (id, near_cnt, kw_score), kw_score flat 0.5 like
    the reference's FTS branch.

    Shape: position-delta variant of phrase_search — one posexplode scan
    In-filtered to the term set, positions aggregate per (id, term), and
    the window test is pure array expressions (exists/filter) on docs
    that contain ALL terms. Only postings of the query's terms shuffle."""
    import re

    terms = sorted(set(t for t in re.split(r"[^a-z0-9]+", query_text.lower()) if t))
    if not terms:
        raise ValueError("empty NEAR query")
    k = len(terms)
    W = n + k - 1
    postings = chunks.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    ).filter(F.col("token").isin(terms))
    per_term = postings.groupBy("id", "token").agg(F.collect_list("pos").alias("ps"))
    byid = (
        per_term.groupBy("id")
        .agg(F.map_from_entries(F.collect_list(F.struct("token", "ps"))).alias("tp"))
        .filter(F.size(F.col("tp")) == k)  # docs containing ALL terms
    )
    starts = F.array_distinct(F.flatten(F.map_values(F.col("tp"))))

    def in_window(s):
        # the exists-lambda must be UNARY (a 2nd param means element
        # index to Spark) — bind the window start via closure instead
        return lambda q: (q >= s) & (q <= s + F.lit(int(W)))

    def window_covers(s):
        cond = F.lit(True)
        for t in terms:
            cond = cond & F.exists(F.col("tp")[t], in_window(s))
        return cond

    return (
        byid.withColumn(
            "near_cnt", F.size(F.filter(starts, window_covers)).cast("long")
        )
        .filter(F.col("near_cnt") > 0)
        .select("id", "near_cnt", F.lit(0.5).alias("kw_score"))
        .orderBy(F.col("near_cnt").desc(), F.col("id").asc())
        .limit(limit)
    )


def keyword_search(
    chunks: DataFrame,
    query_text: str,
    limit: int,
    id_col: str = "id",
    text_col: str = "text",
    fts_index: DataFrame | None = None,
    flat_score: bool = False,
) -> DataFrame:
    """ids matching any query term, ranked by distinct-term match count
    (desc), id asc; columns (id, match_cnt, kw_score).

    Plan shape: the term set becomes an In-predicate applied BEFORE the
    distinct — only matching postings ever shuffle (and when probing a
    materialized fts_index table, the In filter pushes into the parquet
    scan). A broadcast join would work too but adds a build stage for a
    handful of literals."""
    import re

    terms = sorted(set(t for t in re.split(r"[^a-z0-9]+", query_text.lower()) if t))
    if fts_index is not None:
        matched_src = fts_index.filter(F.col("token").isin(terms))
    else:
        matched_src = (
            chunks.select(
                F.col(id_col).alias("id"),
                F.explode(tokens(F.col(text_col))).alias("token"),
            )
            .filter(F.col("token").isin(terms))
            .distinct()
        )
    matched = matched_src.groupBy("id").agg(
        F.count("*").cast("long").alias("match_cnt")
    )
    score = F.lit(0.5) if flat_score else F.col("match_cnt").cast("double")
    return (
        matched.withColumn("kw_score", score)
        .orderBy(F.col("match_cnt").desc(), F.col("id").asc())
        .limit(limit)
    )


def match_search(
    chunks: DataFrame,
    match_query: str,
    limit: int,
    id_col: str = "id",
    text_col: str = "text",
    fts_index: DataFrame | None = None,
) -> DataFrame:
    """The FTS5 MATCH front door (`vector_store.cpp:251-262`: the
    reference hands the raw user string to `embeddings_fts MATCH :q`) —
    dispatches on the query's syntax exactly as FTS5 would parse it:

      "quoted phrase"      -> phrase_search  (consecutive tokens)
      NEAR(a b, n)         -> near_search    (n intervening tokens, 10
                                              when omitted, FTS5 default)
      a AND b OR c NOT d   -> boolean_search (uppercase keywords)
      tok~                 -> fuzzy_search   (Lucene-style: marked terms
                                              match within 2 edits via
                                              SymSpell, unmarked stay
                                              exact — an extension
                                              beyond FTS5, which has no
                                              fuzzy operator)
      tok*                 -> prefix_search  (any term ends with *)
      plain terms          -> keyword_search (OR-of-terms)

    All branches rank deterministically (score desc, id asc) and carry
    the FTS branch's flat-0.5 kw_score column contract."""
    import re

    q = match_query.strip()
    near = re.fullmatch(r"NEAR\(\s*([^,)]+?)\s*(?:,\s*(\d+)\s*)?\)", q)
    if near:
        n = int(near.group(2)) if near.group(2) else 10
        return near_search(
            chunks, near.group(1), limit, n=n, id_col=id_col, text_col=text_col
        )
    if len(q) >= 2 and q[0] == '"' and q[-1] == '"':
        return phrase_search(chunks, q[1:-1], limit, id_col=id_col, text_col=text_col)
    toks = q.split()
    if any(t in ("AND", "OR", "NOT") for t in toks):
        return boolean_search(
            chunks, q, limit, id_col=id_col, text_col=text_col, fts_index=fts_index
        )
    if any(t.endswith("~") and t.rstrip("~") for t in toks):
        fuzzy = [t.rstrip("~") for t in toks if t.endswith("~") and t.rstrip("~")]
        exact = tuple(t for t in toks if not t.endswith("~"))
        return fuzzy_search(
            chunks, fuzzy, limit, id_col=id_col, text_col=text_col,
            exact_terms=exact,
        )
    if any(t.endswith("*") and t.rstrip("*") for t in toks):
        return prefix_search(
            chunks, q, limit, id_col=id_col, text_col=text_col, fts_index=fts_index
        )
    return keyword_search(
        chunks, q, limit, id_col=id_col, text_col=text_col, fts_index=fts_index
    )


def deletion_variants(word: str, max_deletes: int = 1) -> list[str]:
    """SymSpell deletion neighborhood of a word (driver-side, for the
    tiny query set): the word itself plus every string reachable by up
    to `max_deletes` single-character deletions, deduped, sorted."""
    out = {word}
    frontier = {word}
    for _ in range(max_deletes):
        frontier = {
            w[:i] + w[i + 1 :] for w in frontier for i in range(len(w))
        }
        out |= frontier
    return sorted(out)


def fuzzy_search(
    chunks: DataFrame,
    query_terms: list[str],
    limit: int,
    max_edit: int = 2,
    id_col: str = "id",
    text_col: str = "text",
    exact_terms: tuple[str, ...] = (),
) -> DataFrame:
    """Typo-tolerant term search via SymSpell deletion-neighborhood
    blocking (Garbe's symmetric delete algorithm): candidate vocabulary
    terms are found by joining the depth-`max_edit` (≤2) deletion
    variants of every corpus term against the same-depth variants of
    each query term — matching depth on both sides is what makes the
    symmetric-delete cover complete at that distance — then candidates
    are VERIFIED with true Levenshtein distance <= `max_edit`. Docs score
    the integer sum over query terms of the best matched term's weight
    1_000_000 // (1 + lev) — exact-match terms dominate, each extra
    edit halves/thirds the contribution; integer arithmetic keeps both
    engines exact. FTS5 has no fuzzy matching; this is the extension a
    query box actually wants when users typo a term.

    Scale shape: the expensive side is linear, not quadratic — each
    vocabulary term emits len(term)+1 variants map-side (vocab is
    Heaps-law small vs the corpus), the query variant table is a
    broadcast literal, and Levenshtein runs only on the candidate pairs
    the deletion join survives (SymSpell's point: no vocab x query
    cross product, no full edit-distance scan). Posting lookup is a
    broadcast semi-join; final ranking is TakeOrderedAndProject."""
    toks = chunks.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    vocab = toks.select("term").distinct()
    # corpus-side deletion neighborhood to depth min(max_edit, 2), built
    # map-side: SymSpell's completeness guarantee needs deletion depth =
    # max edit distance on BOTH sides (depth 1 misses e.g. "jo"~"join").
    # A length-L term emits 1 + L + L*(L-1)/2 variants at depth 2 —
    # bounded per term, and vocab is Heaps-law small vs the corpus.
    depth = min(max_edit, 2)

    def _dels(col):  # all single-character deletions of a string column
        return F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                col.substr(F.lit(1), i - 1), col.substr(i + 1, F.length(col))
            ),
        )

    term = F.col("term")
    var_arr = F.concat(F.array(term), _dels(term))
    if depth >= 2:
        var_arr = F.concat(
            var_arr,
            F.flatten(
                F.transform(
                    F.filter(_dels(term), lambda v: F.length(v) > 0),
                    _dels,
                )
            ),
        )
    # the EMPTY-string variant is kept on both sides: it is the only
    # block linking length<=2 terms to length<=2 queries at distance 2
    # (e.g. query "jo" vs corpus term "ab"), and it joins only those
    # degenerate short strings — negligible blowup (ADVICE r7). The
    # length>0 guard inside the depth-2 expansion below is an argument
    # guard only (deleting from "" is undefined; "" itself still
    # surfaces as a variant of length-1/2 terms).
    vv = vocab.select(
        "term",
        F.explode(F.array_distinct(var_arr)).alias("variant"),
    )
    spark = chunks.sparkSession
    qv = spark.createDataFrame(
        [
            (q, v)
            for q in query_terms
            for v in deletion_variants(q, max_deletes=depth)
        ],
        "qterm string, variant string",
    )
    cand = vv.join(F.broadcast(qv), "variant").select("qterm", "term").distinct()
    ver = cand.withColumn("lev", F.levenshtein("term", "qterm")).filter(
        F.col("lev") <= max_edit
    )
    weights = ver.groupBy("qterm", "term").agg(F.min("lev").alias("lev"))
    if exact_terms:
        # unmarked terms match only themselves (lev 0, full weight) —
        # the Lucene contract where fuzziness is per-`~`-marked term
        ex = spark.createDataFrame(
            [(t, t, 0) for t in exact_terms],
            "qterm string, term string, lev int",
        )
        weights = weights.unionByName(ex)
    dq = (
        toks.join(F.broadcast(weights), "term")
        .groupBy("id", "qterm")
        .agg(F.max(F.expr("1000000 div (1 + lev)")).alias("w"))
    )
    return (
        dq.groupBy("id")
        .agg(
            F.sum("w").cast("long").alias("score_micro"),
            F.count("*").cast("long").alias("n_terms"),
        )
        .withColumn("kw_score", F.lit(0.5))  # FTS-branch flat-score contract
        .orderBy(F.col("score_micro").desc(), F.col("id").asc())
        .limit(limit)
    )


def prf_expand_search(
    chunks: DataFrame,
    query_text: str,
    limit: int,
    fb_docs: int = 10,
    n_expand: int = 5,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio-lite query expansion): run the
    term-match search, take the top `fb_docs` results as assumed-relevant
    feedback, score every non-query term in them by
    df_feedback * ln(N / df_corpus) (rounded 6, term-asc tie-break), add
    the top `n_expand` terms to the query, and re-rank the corpus on the
    expanded term set. The classic recall lever when the original query
    is short — the reference has no analog (its recall lever is the
    semantic branch); this gives the keyword branch one too.

    Plan shape: everything stays declarative — the feedback set and the
    expanded term table are ≤fb_docs/≤|terms| rows and broadcast into
    their joins; both ranking stages are orderBy().limit() =
    TakeOrderedAndProject; the corpus posting table is built once and
    reused by stage 1 (In-filter), term stats, and stage 2 (broadcast
    semi-join). No collect(), no global sort, no UDF."""
    import re

    terms = sorted(set(t for t in re.split(r"[^a-z0-9]+", query_text.lower()) if t))
    toks = chunks.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok") != "")
    fb = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("id")
        .agg(F.count("*").alias("match_cnt"))
        .orderBy(F.col("match_cnt").desc(), F.col("id").asc())
        .limit(fb_docs)
    )
    n_docs = chunks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    df_corpus = toks.groupBy("tok").agg(F.count("*").cast("double").alias("dfc"))
    fb_terms = (
        toks.join(F.broadcast(fb.select("id")), "id")
        .filter(~F.col("tok").isin(terms))
        .groupBy("tok")
        .agg(F.count("*").cast("double").alias("dfb"))
    )
    expanded = (
        fb_terms.join(df_corpus, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            F.round(F.col("dfb") * F.log(F.col("n") / F.col("dfc")), 6).alias(
                "score"
            ),
        )
        .orderBy(F.col("score").desc(), F.col("tok").asc())
        .limit(n_expand)
    )
    spark = chunks.sparkSession
    orig = spark.createDataFrame([(t,) for t in terms], "tok string")
    all_terms = expanded.select("tok").unionByName(orig).distinct()
    return (
        toks.join(F.broadcast(all_terms), "tok")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("match_cnt"))
        .orderBy(F.col("match_cnt").desc(), F.col("id").asc())
        .limit(limit)
    )
