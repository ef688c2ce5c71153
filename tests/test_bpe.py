"""BPE trainer honesty checks: the Spark implementation is re-derived
against an INDEPENDENT pure-Python Sennrich-style reference (dict/Counter
loops, no Spark), plus encode/train consistency and layout invariance.
The golden-VALUES oracles (bpe_merges etc.) guard fixture drift; these
tests guard the algorithm itself."""

import collections

import pytest
from pyspark.sql import functions as F

END = "</w>"


# --- independent reference implementation (pure Python, no Spark) ---

def ref_bpe(word_freqs: dict[str, int], n_merges: int, stop_below: int = 2):
    vocab = {w: list(w) + [END] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, ties by (left, right) ascending
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < stop_below:
            break
        merges.append((l, r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPORA = [
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3,
    ["aaa"] * 4 + ["aaaa"] * 3 + ["ab"] * 7,
    ["x"] * 3,  # single-char words: no pairs beyond (x, </w>)
]


class TestBpeTrain:
    @pytest.mark.parametrize("words", CORPORA)
    def test_matches_pure_python_reference(self, spark, words):
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        wf_dict = collections.Counter(words)
        wf = spark.createDataFrame(
            sorted(wf_dict.items()), "word string, freq long"
        ).repartition(3)
        got_merges, got_final = bpe_train(wf, n_merges=12)
        want_merges, want_vocab = ref_bpe(dict(wf_dict), 12)
        assert got_merges == want_merges
        got_vocab = {
            r["word"]: list(r["syms"]) for r in got_final.collect()
        }
        assert got_vocab == want_vocab

    def test_layout_invariance(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        rows = [("hello", 9), ("help", 4), ("hell", 2), ("yellow", 5)]
        a, _ = bpe_train(
            spark.createDataFrame(rows, "word string, freq long").coalesce(1), 8
        )
        b, _ = bpe_train(
            spark.createDataFrame(rows, "word string, freq long").repartition(8), 8
        )
        assert a == b

    def test_encode_reproduces_training_segmentation(self, spark):
        """GPT-2-style greedy lowest-rank encoding of the training words
        must land on exactly the trained segmentations."""
        import pandas as pd

        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
            encode_udf,
        )

        words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        wf_dict = collections.Counter(words)
        wf = spark.createDataFrame(sorted(wf_dict.items()), "word string, freq long")
        merges, final = bpe_train(wf, n_merges=10)
        trained = {r["word"]: len(r["syms"]) for r in final.collect()}
        gen = encode_udf(merges)
        for word, n_syms in trained.items():
            pdf = pd.DataFrame({"doc_id": [0], "text": [word]})
            out = list(gen(iter([pdf])))[0]
            assert int(out["n_bpe_tokens"][0]) == n_syms, word

    def test_stop_below_halts_early(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        # every word unique -> all pair counts are 1 -> zero merges
        wf = spark.createDataFrame(
            [("abc", 1), ("defg", 1)], "word string, freq long"
        )
        merges, _ = bpe_train(wf, n_merges=5, stop_below=2)
        assert merges == []


class TestBpeFixture:
    def test_fixture_merges_match_reference(self, spark, duck):
        """Full-circle at sf0.01: Spark's 40-merge table equals the pure
        reference over the ORACLE's own word frequencies."""
        from ai_vector_database_converstion_from_pdf_spark import catalog

        wf = dict(
            duck.sql(
                """SELECT w, count(*) FROM (
                     SELECT unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS w FROM documents) GROUP BY w"""
            ).fetchall()
        )
        want, _ = ref_bpe(wf, catalog._BPE_MERGES)
        got = [
            (r["lhs"], r["rhs"], r["pair_freq"])
            for r in catalog.queries()["bpe_merges"](
                spark, "/root/testdata/sf0.01"
            ).collect()
        ]
        assert got == want
