"""Generate an N-times scaled copy of a driver fixture (default: 10x
sf0.1 -> /tmp/sf1) so the FULL 110+-query bench suite can run one tier
above its graded scale factor (VERDICT r8 #1 / r9 #2).

Replication preserves every column and the fixtures' join structure:

- region/nation: fixed dimensions, copied as-is (TPC-H scaling rule).
- customer/supplier/part: primary keys shifted by replica*OFFSET.
- orders: o_orderkey AND o_custkey shifted together, so each order
  points at its own replica's customer — per-key join selectivity is
  exactly the sf0.1 value, only cardinality grows.
- lineitem: l_orderkey/l_partkey/l_suppkey all shifted together.
- events: event_id/user_id shifted (10x users, same per-user history);
  timestamps unchanged, so the event-time range densifies 10x — the
  windowed/sessionize family sees 10x state, not a longer horizon.
- documents/embeddings: ids shifted, text/vectors copied verbatim —
  every doc gains mult-1 EXACT replicas (the planted-duplicate stress
  shape every 10x stress session used): the similarity graph becomes
  replica near-cliques, deliberately tripping the Sigma-deg^2 / FLOP
  auto-dispatch gates so the sweep logs which operators switch.

--mixed (VERDICT r10 #1): the replica tiers above are 90-99% EXACT
duplicates — precisely the corpus shape the exact-collapse pre-stage
trivializes. Real crawls run 30-50% exact-dup with paraphrase-level
near-dups collapse CANNOT shrink. --mixed keeps only `--exact-frac`%
of each doc's replicas verbatim (plus replica 0, the original; a
tenth of the verbatim ones are upper-cased — still the same
content-hash class, exercising collapse normalization) and mutates the
rest with deterministic hash-driven token noise:

  ~2% of tokens get a trailing-char typo, ~2% are deleted, ~1% gain an
  inserted token — ≈5% token-level edit rate, the paraphrase band where
  MinHash/SimHash/shingle-Jaccard candidates are genuinely near (not
  identical) and the banded joins must do real verification work at a
  unique-text scale ~(1-exact_frac)·mult times the base corpus.

Embeddings get the sibling treatment at `--vec-exact-frac` (default 10:
exact vector duplication is rarer than text duplication in real
pipelines — fp noise): non-exact replicas perturb ~5% of coordinates by
~2%, so cosine stays ~0.999 (still a near-dup for the 0.45-threshold
family) while exact-equality vector collapse finds a unique-heavy
corpus and the FLOP probes dispatch the DIRECT plans — the mixed tier
exercises the probes choosing BOTH ways (text: collapsed; vector:
direct).

--clustered-emb K (VERDICT r11 #1): REPLACE the embedding column with a
planted K-center Gaussian-ish mixture — every ANN recall number so far
was measured on near-uniform vectors, IVF's and sign-bit hamming's
documented WORST case and the least realistic shape (real text
embeddings cluster). Center coordinates key on (center, coord) only
(uniform [-1,1], shared exactly by every member); each row adds
`--cluster-spread`·noise with noise keyed on (vec_id, replica, coord)
(sum of two uniforms − 1: triangular, mean 0) — so replicas of a vector
are DISTINCT members of the SAME cluster (near-dup structure), and at
spread 0.5 intra-cluster cosine ≈ 0.9 while inter-cluster cosine ≈ 0.
Takes precedence over --mixed for the embeddings table.

--planted-passages P (VERDICT r11 #5): append a verbatim multi-token
passage to `--passage-pct`% of final documents (selection and passage
id keyed on (doc_id, replica)), drawn from a pool of P deterministic
passages of 30 synthetic tokens each ("zq<p>x<h>" — disjoint from the
corpus vocabulary, so their winnowing fingerprints are passage-unique
and their document frequency is EXACTLY the passage's group size).
This is the actual winnowing_matches use case — shared passages across
otherwise-distinct docs — which no replica/mixed tier ever produced a
non-zero result for (every shared fingerprint there was over the df
cap). Size P so groups land well under the cap: pct·N/P docs share
each passage.

All mutations are keyed on xxhash64(original id, replica, position) —
fully deterministic, no RNG state, reproducible across runs/partitions.

Usage: python tools/make_stress_fixture.py [--mult 10]
           [--src /root/testdata/sf0.1] [--out /tmp/sf1]
           [--mixed] [--exact-frac 40] [--vec-exact-frac 10]
           [--clustered-emb 32] [--cluster-spread 0.5]
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

OFFSET = 10_000_000  # > any key in sf0.1; replica r adds r*OFFSET

SHIFT_COLS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _mixed_text(F, exact_frac: int):
    """Column: paraphrase-mutated `text` for non-exact replicas.

    Decision and every per-token draw key on (doc_id, _rep, pos, tag)
    through xxhash64 — deterministic and partition-independent."""

    def h(tag, *extra):
        return F.pmod(
            F.xxhash64(F.col("doc_id"), F.col("_rep"), F.lit(tag), *extra),
            F.lit(100),
        )

    is_exact = (F.col("_rep") == 0) | (h(1) < F.lit(exact_frac))
    # a tenth of the verbatim replicas upper-case: same content-hash
    # class (md5(lower(trim(text)))), different raw bytes
    cased = F.when(
        (F.col("_rep") > 0) & (h(9) < F.lit(exact_frac // 4)),
        F.upper(F.col("text")),
    ).otherwise(F.col("text"))
    ts = F.split(F.col("text"), r"\s+")
    mut = F.transform(
        ts,
        lambda t, i: F.when(h(2, i) < F.lit(2), F.concat(t, F.lit("x")))
        .when(h(3, i) < F.lit(2), F.lit(""))
        .otherwise(t),
    )
    withins = F.flatten(
        F.transform(
            mut,
            lambda t, i: F.when(
                h(4, i) < F.lit(1),
                F.array(
                    t,
                    F.concat(
                        F.lit("zz"),
                        F.pmod(
                            F.xxhash64(F.col("doc_id"), F.col("_rep"), i),
                            F.lit(50),
                        ).cast("string"),
                    ),
                ),
            ).otherwise(F.array(t)),
        )
    )
    mutated = F.array_join(
        F.filter(withins, lambda t: t != F.lit("")), " "
    )
    return F.when(is_exact, cased).otherwise(mutated)


def _mixed_vec(F, vec_exact_frac: int):
    """Column: perturbed `embedding` for non-exact replicas — ~5% of
    coordinates scaled by 1.02 + 0.003 shift (cosine ~0.999: a
    near-dup, not an exact dup)."""
    is_exact = (F.col("_rep") == 0) | (
        F.pmod(F.xxhash64(F.col("vec_id"), F.col("_rep"), F.lit(1)), F.lit(100))
        < F.lit(vec_exact_frac)
    )
    pert = F.transform(
        F.col("embedding"),
        lambda v, i: F.when(
            F.pmod(F.xxhash64(F.col("vec_id"), F.col("_rep"), i), F.lit(20))
            == 0,
            (v * F.lit(1.02) + F.lit(0.003)).cast("float"),
        ).otherwise(v),
    )
    return F.when(is_exact, F.col("embedding")).otherwise(pert)


def _clustered_vec(F, n_centers: int, spread: float, sizes: str = "balanced"):
    """Column: planted-mixture `embedding` — center[c] + spread·noise.
    Deterministic and partition-independent: center coords key on
    (center, coord), noise on (vec_id, _rep, coord), all through
    xxhash64 (the fixture rule — no RNG state). Tests import this so
    the pytest recall floors pin the exact distribution the stress
    fixtures use.

    `sizes` (r13, VERDICT r12 #5): "balanced" = c uniform over
    n_centers (every prior clustered tier); "zipf" = cluster mass
    ∝ 1/(rank+1) via inverse-CDF on the same hash-uniform draw — at
    32 centers the hottest cluster holds ~24.6% of the corpus (vs
    3.1% balanced), the topic-distribution shape real crawls have.
    Hot-cluster skew is the adversary for the cluster-GEMM k rule
    (one cluster ≫ N/k blows Σc²), IVF probe allocation, and
    SemDeDup's balance assumption."""

    def u(tag, *k):  # uniform [0, 1)
        return F.pmod(
            F.xxhash64(*k, F.lit(tag)), F.lit(1_000_003)
        ).cast("double") / F.lit(1_000_003.0)

    if sizes == "zipf":
        w = [1.0 / (i + 1) for i in range(n_centers)]
        tot = sum(w)
        cum, acc = [], 0.0
        for x in w[:-1]:  # n_centers-1 boundaries; cid = #boundaries ≤ u
            acc += x / tot
            cum.append(acc)
        draw = u("cidz", F.col("vec_id"))
        cid = F.size(F.filter(F.lit(cum), lambda b: b <= draw)).cast("long")
    elif sizes == "balanced":
        cid = F.pmod(F.xxhash64(F.col("vec_id"), F.lit("clu")), F.lit(n_centers))
    else:
        raise ValueError(f"unknown --cluster-sizes {sizes!r}")
    return F.transform(
        F.col("embedding"),
        lambda v, i: (
            (u("c", cid, i) * 2.0 - 1.0)
            + F.lit(spread)
            * (
                u("n1", F.col("vec_id"), F.col("_rep"), i)
                + u("n2", F.col("vec_id"), F.col("_rep"), i)
                - 1.0
            )
        ).cast("float"),
    )


def _planted_passage_text(F, n_passages: int, pct: int):
    """Column: `text` with a deterministic shared passage appended for
    ~pct% of docs. Passage tokens are vocabulary-disjoint ("zq<p>x<h>")
    so fingerprint df == group size by construction."""
    sel = F.pmod(
        F.xxhash64(F.col("doc_id"), F.col("_rep"), F.lit("pp")), F.lit(100)
    ) < F.lit(pct)
    pid = F.pmod(
        F.xxhash64(F.col("doc_id"), F.col("_rep"), F.lit("ppid")),
        F.lit(n_passages),
    )
    passage = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda j: F.concat(
                F.lit("zq"),
                pid.cast("string"),
                F.lit("x"),
                F.pmod(F.xxhash64(pid, j, F.lit("ppw")), F.lit(9973)).cast(
                    "string"
                ),
            ),
        ),
        " ",
    )
    return F.when(
        sel, F.concat(F.col("text"), F.lit(" "), passage)
    ).otherwise(F.col("text"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--exact-frac", type=int, default=40)
    ap.add_argument("--vec-exact-frac", type=int, default=10)
    ap.add_argument("--clustered-emb", type=int, default=0)
    ap.add_argument("--cluster-spread", type=float, default=0.5)
    ap.add_argument(
        "--cluster-sizes", default="balanced", choices=["balanced", "zipf"]
    )
    ap.add_argument("--planted-passages", type=int, default=0)
    ap.add_argument("--passage-pct", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.session import get_spark
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import (
        load_events,
    )

    spark = get_spark("make-stress-fixture")
    os.makedirs(args.out, exist_ok=True)
    reps = spark.range(args.mult).select(F.col("id").alias("_rep"))
    for table, keys in SHIFT_COLS.items():
        src = f"{args.src}/{table}.parquet"
        dst = f"{args.out}/{table}.parquet"
        # events: normalize nanos/NTZ timestamps exactly as the engine
        # reads them, so the scaled fixture is plain micros
        df = load_events(spark, args.src) if table == "events" else spark.read.parquet(src)
        if keys:
            df = df.crossJoin(F.broadcast(reps))
            # mutate BEFORE shifting: mutation draws key on the
            # ORIGINAL id so every replica of a doc draws its own
            # independent noise
            if args.mixed and table == "documents":
                df = df.withColumn("text", _mixed_text(F, args.exact_frac))
            if args.planted_passages > 0 and table == "documents":
                # AFTER the mixed mutation: passages stay verbatim
                df = df.withColumn(
                    "text",
                    _planted_passage_text(
                        F, args.planted_passages, args.passage_pct
                    ),
                )
            if table == "embeddings" and args.clustered_emb > 0:
                df = df.withColumn(
                    "embedding",
                    _clustered_vec(
                        F,
                        args.clustered_emb,
                        args.cluster_spread,
                        sizes=args.cluster_sizes,
                    ),
                )
            elif args.mixed and table == "embeddings":
                df = df.withColumn(
                    "embedding", _mixed_vec(F, args.vec_exact_frac)
                )
            df = df.select(
                *[
                    (F.col(c) + F.col("_rep") * OFFSET).cast("long").alias(c)
                    if c in keys
                    else F.col(c)
                    for c in df.columns
                    if c != "_rep"
                ]
            )
        df.write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"wrote {dst}: {n} rows")


if __name__ == "__main__":
    main()
