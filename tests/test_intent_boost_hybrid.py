"""Q9 inside the flagship: a definition-typed chunk must gain +0.5 under
a definition-intent query when it entered via the semantic branch
(`vector_store.cpp:402-409`)."""

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.functions.embed import hash_embed
from ai_vector_database_converstion_from_pdf_spark.plans.hybrid import hybrid_search


def _corpus(spark):
    texts = [
        (1, "theorem states the key property of joins", "definition", 0),
        (2, "theorem states the key property of joins", "text", 0),
        (3, "unrelated content about streams entirely", "text", 0),
        (4, "more filler rows to widen the corpus set", "text", 0),
    ]
    docs = spark.createDataFrame(
        texts, "doc_id long, text string, chunk_type string, heading_level int"
    )
    emb = spark.createDataFrame(
        [(i, hash_embed(t, 16)) for i, t, _, _ in texts],
        "vec_id long, embedding array<float>",
    )
    return docs, emb


def test_definition_boost_applied(spark):
    docs, emb = _corpus(spark)
    q = "what is the theorem property"  # definition intent
    qvec = hash_embed(q, 16)
    with_boost = {
        r["id"]: r["score"]
        for r in hybrid_search(
            docs, emb, q, qvec, k=4,
            chunk_type_col="chunk_type", heading_level_col="heading_level",
        ).collect()
    }
    without = {
        r["id"]: r["score"]
        for r in hybrid_search(docs, emb, q, qvec, k=4).collect()
    }
    # doc 1 and 2 are textually identical; only doc 1 is typed 'definition'
    assert abs((with_boost[1] - without[1]) - 0.5) < 1e-9
    assert abs(with_boost[2] - without[2]) < 1e-9
    # boosted definition chunk outranks its identical untyped twin
    assert with_boost[1] > with_boost[2]


def test_boost_not_applied_for_general_intent(spark):
    docs, emb = _corpus(spark)
    # careful: 'theorem' itself triggers definition intent
    # (vector_store.cpp:241) — use trigger-free terms
    q = "key property rows joins"  # → general intent
    qvec = hash_embed(q, 16)
    with_meta = {
        r["id"]: r["score"]
        for r in hybrid_search(
            docs, emb, q, qvec, k=4,
            chunk_type_col="chunk_type", heading_level_col="heading_level",
        ).collect()
    }
    without = {
        r["id"]: r["score"]
        for r in hybrid_search(docs, emb, q, qvec, k=4).collect()
    }
    assert with_meta == without
