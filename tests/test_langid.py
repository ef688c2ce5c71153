"""Cavnar-Trenkle trigram language ID (operators/langid.py): accuracy on
a genuinely multilingual labeled fixture (sentences DISTINCT from the
seed passages the profiles were built on), and the strict-improvement
contract over the marker-token heuristic (VERDICT r6 next-round #5)."""

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.langid import (
    PROFILES,
    build_profiles,
    lang_id_trigram,
)
from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
    detect_lang,
)

# held-out sentences, none shared with langid.SEED_TEXT
FIXTURE = [
    ("en", "yesterday we visited the old library and read about the history of the city"),
    ("en", "she said that the train would arrive later than usual because of the storm"),
    ("en", "there is nothing better than a warm meal after a long day of work"),
    ("en", "the children played in the garden until the sun went down behind the hills"),
    ("en", "he could not remember where he had left the keys to the front door"),
    ("es", "ayer visitamos la biblioteca antigua y leímos sobre la historia de la ciudad"),
    ("es", "ella dijo que el tren llegaría más tarde de lo habitual por la tormenta"),
    ("es", "no hay nada mejor que una comida caliente después de un largo día de trabajo"),
    ("es", "los niños jugaron en el jardín hasta que el sol se puso detrás de las colinas"),
    ("es", "no podía recordar dónde había dejado las llaves de la puerta principal"),
    ("fr", "hier nous avons visité la vieille bibliothèque et lu sur l'histoire de la ville"),
    ("fr", "elle a dit que le train arriverait plus tard que d'habitude à cause de l'orage"),
    ("fr", "il n'y a rien de mieux qu'un repas chaud après une longue journée de travail"),
    ("fr", "les enfants ont joué dans le jardin jusqu'à ce que le soleil se couche derrière les collines"),
    ("fr", "il ne pouvait pas se rappeler où il avait laissé les clés de la porte d'entrée"),
    ("de", "gestern besuchten wir die alte bibliothek und lasen über die geschichte der stadt"),
    ("de", "sie sagte, dass der zug wegen des sturms später als gewöhnlich ankommen würde"),
    ("de", "es gibt nichts besseres als eine warme mahlzeit nach einem langen arbeitstag"),
    ("de", "die kinder spielten im garten, bis die sonne hinter den hügeln unterging"),
    ("de", "er konnte sich nicht erinnern, wo er die schlüssel zur haustür gelassen hatte"),
]


def _fixture_df(spark):
    return spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(FIXTURE)],
        "doc_id long, lang string, text string",
    )


def test_profiles_deterministic_and_shaped():
    p = build_profiles()
    assert sorted(p) == ["de", "en", "es", "fr"]
    assert all(len(v) == 120 for v in p.values())
    assert p == PROFILES  # import-time build is reproducible
    # function-word trigrams dominate, the Cavnar-Trenkle signal
    assert "the" in p["en"][:10]
    assert " la" in p["es"][:10]


def test_trigram_accuracy_beats_marker_heuristic(spark):
    docs = _fixture_df(spark)
    preds = lang_id_trigram(docs).withColumnRenamed("id", "doc_id")
    both = (
        docs.join(preds, "doc_id")
        .withColumn("marker_pred", detect_lang(F.col("text")))
        .select("lang", "lang_pred", "marker_pred")
        .collect()
    )
    n = len(both)
    tri_acc = sum(r["lang_pred"] == r["lang"] for r in both) / n
    marker_acc = sum(r["marker_pred"] == r["lang"] for r in both) / n
    # the real classifier is perfect on held-out prose; the marker
    # heuristic is not (it has no 'fr' signal for half these sentences
    # and mislabels accent-free es/de ones)
    assert tri_acc == 1.0
    assert tri_acc > marker_acc


def test_short_and_empty_text_is_und(spark):
    # 'und' iff the normalized text yields NO trigram (< 1 letter);
    # a single letter pads to one trigram (" a ") and classifies
    docs = spark.createDataFrame(
        [(0, ""), (1, "7 %"), (2, "   "), (3, "a")],
        "doc_id long, text string",
    )
    out = {r["id"]: r["lang_pred"] for r in lang_id_trigram(docs).collect()}
    assert out[0] == "und" and out[1] == "und" and out[2] == "und"
    assert out[3] != "und"


def test_mapside_equals_shuffle_plan(spark):
    """The default shuffle-free mapInPandas path must produce EXACTLY
    the rows of the pure-DataFrame plan (which mirrors the SQL oracle):
    same predictions, same distances, same und/NULL handling — on the
    held-out fixture AND the synthetic documents table."""
    import os

    frames = [_fixture_df(spark).select("doc_id", "text")]
    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    frames.append(
        spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    )
    for df in frames:
        a = {
            r["id"]: (r["lang_pred"], r["distance"])
            for r in lang_id_trigram(df, method="mapside").collect()
        }
        b = {
            r["id"]: (r["lang_pred"], r["distance"])
            for r in lang_id_trigram(df, method="shuffle").collect()
        }
        assert a == b


def test_distance_ties_break_by_language_code(spark):
    # a doc whose trigrams hit no profile gets the same max penalty for
    # every language -> deterministic 'de' (first code alphabetically)
    docs = spark.createDataFrame(
        [(0, "zzzz qqqq xxxx")], "doc_id long, text string"
    )
    rows = lang_id_trigram(docs).collect()
    assert rows[0]["lang_pred"] == "de"
