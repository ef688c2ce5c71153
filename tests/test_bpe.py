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


def ref_bpe_batched(
    word_freqs: dict[str, int],
    n_merges: int,
    batch_size: int,
    stop_below: int = 2,
    accept: str = "prefix",
):
    """Independent pure-Python model of the BATCHED round rule: rank
    pairs by (count desc, pair asc), accept the maximal prefix that is
    pairwise symbol-disjoint (minted symbols included) — or, in scan
    mode, the greedy rank-ordered independent set within a 4*batch
    lookahead — apply in rank order, recount."""
    vocab = {w: list(w) + [END] for w in word_freqs}
    merges = []
    while len(merges) < n_merges:
        pairs = collections.Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want = min(batch_size, n_merges - len(merges))
        lookahead = want if accept == "prefix" else max(4 * want, want)
        if not ranked or ranked[0][1] < stop_below:
            break
        touched, accepted = set(), []
        for (l, r), cnt in ranked[:lookahead]:
            if cnt < stop_below or len(accepted) >= want:
                break
            if {l, r, l + r} & touched:
                if accept == "prefix":
                    break
                continue
            touched |= {l, r, l + r}
            accepted.append((l, r, cnt))
        merges.extend(accepted)
        for l, r, _cnt in accepted:
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


class TestBpeBatched:
    @pytest.mark.parametrize("words", CORPORA)
    @pytest.mark.parametrize("batch", [2, 4])
    def test_matches_batched_reference(self, spark, words, batch):
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        wf_dict = collections.Counter(words)
        wf = spark.createDataFrame(
            sorted(wf_dict.items()), "word string, freq long"
        ).repartition(3)
        got_merges, got_final = bpe_train(wf, n_merges=12, batch_size=batch)
        want_merges, want_vocab = ref_bpe_batched(dict(wf_dict), 12, batch)
        assert got_merges == want_merges
        got_vocab = {r["word"]: list(r["syms"]) for r in got_final.collect()}
        assert got_vocab == want_vocab

    def test_batch_one_is_sequential(self, spark):
        """batch_size=1 must stay byte-identical to the classic loop —
        the golden-oracled catalog entries depend on it."""
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        words = CORPORA[0]
        wf = spark.createDataFrame(
            sorted(collections.Counter(words).items()),
            "word string, freq long",
        )
        seq, _ = bpe_train(wf, n_merges=10)
        one, _ = bpe_train(wf, n_merges=10, batch_size=1)
        want, _ = ref_bpe(dict(collections.Counter(words)), 10)
        assert seq == one == want

    def test_interaction_stops_the_prefix(self, spark):
        """'ab'x100 + 'cd'x90: after ('a','b') the minted pair
        ('ab','</w>') outranks ('c','d') — a batch that blindly accepted
        disjoint ('c','d') in round 1 would be fine under the batched
        contract, but the PREFIX rule must stop at ('b','</w>') (shares
        'b') so round 1 accepts exactly [('a','b')], and round 2's fresh
        count sees ('ab','</w>') first. The pure reference encodes the
        same rule; this pins the counterexample explicitly."""
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        wf_dict = {"ab": 100, "cd": 90}
        wf = spark.createDataFrame(
            sorted(wf_dict.items()), "word string, freq long"
        )
        got, _ = bpe_train(wf, n_merges=4, batch_size=4)
        want, _ = ref_bpe_batched(wf_dict, 4, 4)
        assert got == want
        assert got[0][:2] == ("a", "b")
        assert got[1][:2] == ("ab", END)  # minted pair won round 2

    @pytest.mark.parametrize("words", CORPORA)
    def test_scan_mode_matches_reference(self, spark, words):
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        wf_dict = collections.Counter(words)
        wf = spark.createDataFrame(
            sorted(wf_dict.items()), "word string, freq long"
        ).repartition(3)
        got, _ = bpe_train(wf, n_merges=12, batch_size=4, accept="scan")
        want, _ = ref_bpe_batched(dict(wf_dict), 12, 4, accept="scan")
        assert got == want

    def test_scan_skips_conflicts_and_accepts_more(self, spark):
        """'ab'x100 + 'cd'x90: prefix mode stops round 1 at [('a','b')]
        (rank-2 ('b','</w>') interacts); scan mode skips the conflict
        and also accepts the disjoint ('c','d') in the same round."""
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        wf_dict = {"ab": 100, "cd": 90}
        wf = spark.createDataFrame(
            sorted(wf_dict.items()), "word string, freq long"
        )
        got, _ = bpe_train(wf, n_merges=2, batch_size=2, accept="scan")
        want, _ = ref_bpe_batched(wf_dict, 2, 2, accept="scan")
        assert got == want
        assert [m[:2] for m in got] == [("a", "b"), ("c", "d")]

    def test_scan_batch_one_is_sequential(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        words = CORPORA[0]
        wf = spark.createDataFrame(
            sorted(collections.Counter(words).items()),
            "word string, freq long",
        )
        a, _ = bpe_train(wf, n_merges=8, batch_size=1, accept="scan")
        b, _ = bpe_train(wf, n_merges=8, batch_size=1)
        assert a == b

    def test_bad_accept_rejected(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        wf = spark.createDataFrame([("ab", 2)], "word string, freq long")
        with pytest.raises(ValueError, match="accept"):
            bpe_train(wf, n_merges=1, accept="nope")

    def test_bad_batch_rejected(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
            bpe_train,
        )

        wf = spark.createDataFrame([("ab", 2)], "word string, freq long")
        with pytest.raises(ValueError):
            bpe_train(wf, n_merges=1, batch_size=0)


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
