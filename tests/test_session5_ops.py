"""Fifth-session operators: binary-sign ANN, bloom decontamination,
triangle counting, sparse TF-IDF document similarity."""

import math
import random

import pytest
from pyspark.sql import Row, functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


# ---------------------------------------------------------------------------
# binary sign quantization / Hamming ANN
# ---------------------------------------------------------------------------


class TestBinarySignANN:
    def _random_vecs(self, n, dim, seed):
        rng = random.Random(seed)
        return [
            [rng.uniform(-1, 1) if rng.random() > 0.05 else 0.0 for _ in range(dim)]
            for _ in range(n)
        ]

    @pytest.mark.parametrize("dim", [64, 70, 130])
    def test_packed_hamming_matches_per_dim(self, spark, dim):
        """bit_count(xor) over packed words == per-dimension sign
        disagreement count, including dims not a multiple of 64 and
        exact zeros (>= 0 rule on both sides)."""
        from ai_vector_database_converstion_from_pdf_spark.operators.quantize import (
            sign_bits_col,
        )

        vecs = self._random_vecs(50, dim, seed=dim)
        q = self._random_vecs(1, dim, seed=999)[0]
        df = spark.createDataFrame(
            [Row(i=i, v=[float(x) for x in vec]) for i, vec in enumerate(vecs)]
        )
        words = sign_bits_col(F.col("v"), dim)
        qwords = []
        for w in range((dim + 63) // 64):
            acc = 0
            for i in range(min(64, dim - w * 64)):
                if q[w * 64 + i] >= 0.0:
                    acc |= 1 << i
            if acc >= 1 << 63:
                acc -= 1 << 64
            qwords.append(acc)
        ham = None
        for wcol, qw in zip(words, qwords):
            h = F.bit_count(wcol.bitwiseXOR(F.lit(qw).cast("long")))
            ham = h if ham is None else ham + h
        got = {r.i: r.h for r in df.select("i", ham.alias("h")).collect()}
        for i, vec in enumerate(vecs):
            want = sum((a >= 0) != (b >= 0) for a, b in zip(vec, q))
            assert got[i] == want, f"row {i}: {got[i]} != {want}"

    def test_shortlist_recall_on_fixture(self, spark):
        """Binary shortlist-then-rescore recovers most of the exact
        top-10 on the sf0.01 embeddings (50-deep shortlist)."""
        from ai_vector_database_converstion_from_pdf_spark.catalog import _query_vec
        from ai_vector_database_converstion_from_pdf_spark.operators.quantize import (
            binary_topk_rescore,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.semantic import (
            semantic_topk,
        )

        emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        qv = _query_vec(spark, SF_ORACLE)
        exact = {r.vec_id for r in semantic_topk(emb, qv, k=10).collect()}
        approx = {r.vec_id for r in binary_topk_rescore(emb, qv, k=10).collect()}
        # 1-bit sketches at dim 64 are coarse; demand a real majority
        assert len(exact & approx) >= 6
        # query vector itself (vec_id 0, hamming 0) must always survive
        assert 0 in approx

    def test_malformed_rows_filtered_not_misscored(self, spark):
        """Short vectors / null elements are excluded before sign
        packing — a truncated copy of the query must NOT outrank real
        rows by having its missing dims read as sign matches."""
        from ai_vector_database_converstion_from_pdf_spark.operators.quantize import (
            binary_topk_rescore,
        )

        q = [1.0, -1.0, 1.0, -1.0]
        rows = [
            (1, [1.0, -1.0, 1.0, -1.0]),   # exact match
            (2, [-1.0, 1.0, -1.0, 1.0]),   # opposite
            (3, [1.0, -1.0]),              # truncated -> must be dropped
            (4, [1.0, None, 1.0, -1.0]),   # null element -> dropped
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = [r.vec_id for r in binary_topk_rescore(df, q, k=4).collect()]
        assert 3 not in got and 4 not in got
        assert got[0] == 1


# ---------------------------------------------------------------------------
# bloom-prefiltered decontamination
# ---------------------------------------------------------------------------


class TestBloomDecontaminate:
    @pytest.mark.parametrize("m_bits", [1 << 8, 1 << 16])
    def test_equals_exact_path(self, spark, m_bits):
        """Bloom pruning + exact verify == the exact broadcast path,
        even with a 256-bit bitmap that is mostly false positives."""
        from ai_vector_database_converstion_from_pdf_spark.operators.decontaminate import (
            bloom_contamination,
            ngram_contamination,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        train = docs.filter(F.col("doc_id") % 10 != 0)
        ev = docs.filter(F.col("doc_id") % 10 == 0)
        exact = sorted(
            (r.train_id, r.eval_id, r.n_hits)
            for r in ngram_contamination(train, ev, n=5, min_hits=2).collect()
        )
        bloom = sorted(
            (r.train_id, r.eval_id, r.n_hits)
            for r in bloom_contamination(
                train, ev, n=5, min_hits=2, m_bits=m_bits, n_hashes=2
            ).collect()
        )
        assert bloom == exact
        assert len(exact) > 0  # fixture actually contains collisions

    def test_empty_eval_set(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.decontaminate import (
            bloom_contamination,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        out = bloom_contamination(
            docs, docs.filter(F.lit(False)), n=5, min_hits=1, m_bits=1 << 10
        )
        assert out.count() == 0

    def test_bloom_actually_prunes(self, spark):
        """With an adequately sized bitmap, the verify join input is a
        small fraction of the training shingle volume (the whole point
        of the bloom stage)."""
        from ai_vector_database_converstion_from_pdf_spark.operators import (
            decontaminate as dc,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
            word_shingles,
        )
        import numpy as np

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        train = docs.filter(F.col("doc_id") % 10 != 0)
        ev = docs.filter(F.col("doc_id") % 10 == 0)
        m_bits, n_hashes = 1 << 16, 2
        train_sh = word_shingles(train, n=5)
        eval_sh = word_shingles(ev, n=5)

        def positions(col):
            return F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.concat(col, F.lit(f"#bloom{j}"))), F.lit(m_bits)
                    ).cast("long")
                    for j in range(n_hashes)
                ]
            )

        pos = (
            eval_sh.select(F.explode(positions(F.col("shingle"))).alias("p"))
            .distinct()
            .collect()
        )
        bm = np.zeros(m_bits, dtype=bool)
        bm[np.fromiter((r.p for r in pos), dtype=np.int64)] = True
        rows = train_sh.select(positions(F.col("shingle")).alias("ps")).collect()
        total = len(rows)
        passed = sum(1 for r in rows if all(bm[p] for p in r.ps))
        # true collisions are rare in the fixture; survivors should be a
        # minority of the shingle volume at 2^16 bits
        assert passed < total * 0.5, (passed, total)


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------


class TestTriangleCounts:
    def _run(self, spark, edges):
        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            triangle_counts,
        )

        df = spark.createDataFrame(
            [Row(id_a=a, id_b=b) for a, b in edges], "id_a long, id_b long"
        )
        return {r.id: r.triangles for r in triangle_counts(df).collect()}

    def test_four_clique_plus_pendant(self, spark):
        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        got = self._run(spark, k4 + [(4, 5)])
        # K4 has 4 triangles; every clique node sits on C(3,2)=3 of them
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_duplicate_and_reversed_edges_canonicalized(self, spark):
        tri = [(1, 2), (2, 3), (1, 3)]
        noisy = tri + [(2, 1), (3, 2), (1, 2), (3, 1), (7, 7)]
        got = self._run(spark, noisy)
        assert got == {1: 1, 2: 1, 3: 1}

    def test_triangle_free_graph_empty(self, spark):
        got = self._run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert got == {}

    def test_matches_brute_force_on_fixture_graph(self, spark):
        """Degree-oriented compact-forward returns exactly the brute
        force per-node counts on the sf0.001 simhash pair graph."""
        from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
            simhash_pairs,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            triangle_counts,
        )
        import collections
        import itertools

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        pairs = simhash_pairs(docs, max_hamming=3).select("id_a", "id_b")
        rows = [(r.id_a, r.id_b) for r in pairs.collect()]
        adj = collections.defaultdict(set)
        for a, b in rows:
            adj[a].add(b)
            adj[b].add(a)
        want = collections.Counter()
        for a, b in rows:
            for c in adj[a] & adj[b]:
                if c > max(a, b):
                    want[a] += 1
                    want[b] += 1
                    want[c] += 1
        got = {r.id: r.triangles for r in triangle_counts(pairs).collect()}
        assert got == dict(want)

    def test_auto_dispatch_sparse_stays_exact(self, spark):
        """sample_p="auto" below the wedge budget is byte-identical to
        the exact path — same column name, same counts."""
        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            triangle_counts,
        )

        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        df = spark.createDataFrame(
            [Row(id_a=a, id_b=b) for a, b in k4], "id_a long, id_b long"
        )
        out = triangle_counts(df, sample_p="auto")
        assert "triangles" in out.columns
        got = {r.id: r.triangles for r in out.collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_auto_dispatch_dense_switches_to_doulion(self, spark):
        """Above the wedge budget, auto mode switches to DOULION: the
        estimate column appears and the (deterministic-hash) estimate
        lands near the true global count."""
        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            triangle_counts,
        )

        n = 40  # K40: sum(deg^2) = 40 * 39^2 = 60,840 >> budget 1,000
        edges = [(a, b) for a in range(n) for b in range(a + 1, n)]
        df = spark.createDataFrame(
            [Row(id_a=a, id_b=b) for a, b in edges], "id_a long, id_b long"
        )
        out = triangle_counts(df, sample_p="auto", auto_wedge_budget=1000.0)
        assert "triangles_est" in out.columns
        total_est = sum(r.triangles_est for r in out.collect()) / 3
        true_total = n * (n - 1) * (n - 2) / 6
        # p ~ sqrt(1000/60840) ~ 0.13 -> ~21 surviving triangles; loose
        # band, but deterministic (content-hash sampling, fixed salt)
        assert 0.25 * true_total < total_est < 4 * true_total, total_est


# ---------------------------------------------------------------------------
# sparse TF-IDF document similarity
# ---------------------------------------------------------------------------


class TestTfidfDocSimilarity:
    def _brute(self, texts, k, max_df):
        import re

        tok = lambda t: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        n = len(texts)
        tfs = []
        for t in texts:
            tf = {}
            for w in tok(t):
                tf[w] = tf.get(w, 0) + 1
            tfs.append(tf)
        df = {}
        for tf in tfs:
            for w in tf:
                df[w] = df.get(w, 0) + 1
        weights = []
        for tf in tfs:
            wv = {}
            for w, c in tf.items():
                if df[w] <= max_df:
                    raw = round(c * (math.log((n + 1.0) / (df[w] + 1.0)) + 1.0), 6)
                    wv[w] = int(round(raw * 1e6))
            weights.append(wv)
        out = []
        for a in range(n):
            for b in range(a + 1, n):
                dot = sum(weights[a][w] * weights[b].get(w, 0) for w in weights[a])
                if dot == 0:
                    continue
                na = math.sqrt(sum(v * v for v in weights[a].values()))
                nb = math.sqrt(sum(v * v for v in weights[b].values()))
                out.append((a, b, round(dot / (na * nb), 6)))
        out.sort(key=lambda r: (-r[2], r[0], r[1]))
        return out[:k]

    def test_matches_brute_force(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.tfidf import (
            doc_similarity_topk,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox leaps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "five dozen jugs of liquor packed in my box",
            "an entirely unrelated sentence about spark plans",
            "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        ]
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        got = [
            (r.id_a, r.id_b, r.cos_sim)
            for r in doc_similarity_topk(docs, k=5, max_df=100).collect()
        ]
        want = self._brute(texts, k=5, max_df=100)
        assert got == want
        # the exact duplicate pair must rank first at cosine 1.0
        assert got[0][:2] == (0, 5) and got[0][2] == pytest.approx(1.0)

    def test_df_cap_drops_stopword_band(self, spark):
        """A term present in every doc carries no weight under the cap,
        so two docs sharing ONLY that term have no pair row."""
        from ai_vector_database_converstion_from_pdf_spark.operators.tfidf import (
            doc_similarity_topk,
        )

        texts = ["common alpha", "common beta", "common gamma", "common delta"]
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        out = doc_similarity_topk(docs, k=10, max_df=3).collect()
        assert out == []


# ---------------------------------------------------------------------------
# DSIR importance weights + logistic quality probe
# ---------------------------------------------------------------------------


class TestDsirAndProbe:
    def test_dsir_separates_target_language(self, spark):
        """Docs in the target (en) slice must average a higher
        importance weight than the rest — the resampling signal."""
        from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
            dsir_importance_weights,
        )

        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        out = dsir_importance_weights(docs, docs.filter(F.col("lang") == "en"))
        j = out.join(docs.select("doc_id", "lang"), "doc_id")
        rows = j.groupBy(F.col("lang") == "en").agg(F.avg("weight")).collect()
        means = {r[0]: r[1] for r in rows}
        assert means[True] > means[False]

    def test_dsir_partition_invariance(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
            dsir_importance_weights,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        tgt = docs.filter(F.col("lang") == "en")
        a = sorted(
            (r.doc_id, r.n_tokens, r.weight)
            for r in dsir_importance_weights(docs, tgt).collect()
        )
        b = sorted(
            (r.doc_id, r.n_tokens, r.weight)
            for r in dsir_importance_weights(
                docs.repartition(7), tgt.repartition(3)
            ).collect()
        )
        assert a == b

    def test_probe_separates_labels_and_improves(self, spark):
        """Scores must separate en from non-en, and two GD steps must
        separate MORE than one (the training actually trains)."""
        from ai_vector_database_converstion_from_pdf_spark.operators.linear import (
            logistic_probe,
        )

        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")

        def sep(n_iters):
            out = logistic_probe(docs, F.col("lang") == "en", n_iters=n_iters)
            m = {r[0]: r[1] for r in out.groupBy("y").agg(F.avg("score")).collect()}
            return m[1] - m[0]

        s1, s2 = sep(1), sep(2)
        assert s1 > 0
        assert s2 > s1

    def test_probe_partition_invariance(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.linear import (
            logistic_probe,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = sorted(
            (r.id, r.y, r.score)
            for r in logistic_probe(docs, F.col("lang") == "en").collect()
        )
        b = sorted(
            (r.id, r.y, r.score)
            for r in logistic_probe(
                docs.repartition(11), F.col("lang") == "en"
            ).collect()
        )
        assert a == b


# ---------------------------------------------------------------------------
# as-of join directions
# ---------------------------------------------------------------------------


class TestAsofDirections:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 100, 10.0), (1, 200, 20.0), (2, 50, 5.0), (3, 10, 1.0)],
            "k long, ts long, lv double",
        )
        right = spark.createDataFrame(
            [(1, 90, 9.0), (1, 150, 15.0), (1, 300, 30.0), (2, 60, 6.0)],
            "k long, ts long, rv double",
        )
        return left, right

    def _run(self, spark, direction):
        from ai_vector_database_converstion_from_pdf_spark.operators.asof import (
            asof_join,
        )

        left, right = self._frames(spark)
        out = asof_join(
            left, right, key="k", ts_col="ts", right_value_col="rv",
            direction=direction,
        )
        return {(r.k, r.ts): r.asof_value for r in out.collect()}

    def test_backward(self, spark):
        assert self._run(spark, "backward") == {
            (1, 100): 9.0, (1, 200): 15.0, (2, 50): None, (3, 10): None,
        }

    def test_forward(self, spark):
        assert self._run(spark, "forward") == {
            (1, 100): 15.0, (1, 200): 30.0, (2, 50): 6.0, (3, 10): None,
        }

    def test_nearest_prefers_closer_and_ties_backward(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.asof import (
            asof_join,
        )

        # (k=1, ts=100): bwd delta 10 (ts 90) < fwd delta 50 -> 9.0
        # (k=1, ts=200): bwd delta 50 (ts 150) < fwd delta 100 -> 15.0
        # (k=2, ts=50):  no bwd, fwd 6.0; (k=3): no match at all
        assert self._run(spark, "nearest") == {
            (1, 100): 9.0, (1, 200): 15.0, (2, 50): 6.0, (3, 10): None,
        }
        # exact tie -> backward (pandas rule)
        left = spark.createDataFrame([(1, 100)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 90, 111.0), (1, 110, 222.0)], "k long, ts long, rv double"
        )
        out = asof_join(
            left, right, key="k", ts_col="ts", right_value_col="rv",
            direction="nearest",
        )
        assert out.collect()[0].asof_value == 111.0

    def test_duplicate_right_ts_deterministic(self, spark):
        """Several right rows sharing (key, ts): the match must be the
        max-struct (i.e. max value at that ts) row REGARDLESS of input
        partition layout — the tertiary _m sort key in both windows."""
        from ai_vector_database_converstion_from_pdf_spark.operators.asof import (
            asof_join,
        )

        left = spark.createDataFrame([(1, 100), (1, 40)], "k long, ts long")
        dup_rows = [(1, 50, 7.0), (1, 50, 3.0), (1, 50, 5.0)]
        for nparts in (1, 2, 3):
            right = spark.createDataFrame(
                dup_rows, "k long, ts long, rv double"
            ).repartition(nparts)
            for direction in ("backward", "forward", "nearest"):
                out = asof_join(
                    left, right, key="k", ts_col="ts",
                    right_value_col="rv", direction=direction,
                )
                got = {r.ts: r.asof_value for r in out.collect()}
                # ts=100 matches backward/nearest; ts=40 forward/nearest
                for v in got.values():
                    assert v in (None, 7.0), (direction, nparts, got)

    def test_nearest_single_shuffle(self, spark):
        """Both directional windows must share ONE key exchange."""
        from ai_vector_database_converstion_from_pdf_spark.operators.asof import (
            asof_join,
        )

        left, right = self._frames(spark)
        out = asof_join(
            left, right, key="k", ts_col="ts", right_value_col="rv",
            direction="nearest",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # hashpartitioning(k, ...) appears in exactly one Exchange
        import re

        n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_exchanges == 1, plan[:2000]


# ---------------------------------------------------------------------------
# audio fingerprint dedup
# ---------------------------------------------------------------------------


class TestAudioFingerprints:
    def _media(self, spark):
        import numpy as np
        from ai_vector_database_converstion_from_pdf_spark.functions.audiocodec import (
            encode_wav,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
            MEDIA_SCHEMA,
        )

        sr = 8000

        def melody(notes, amp=12000, noise=0.0, seed=0):
            # a SEQUENCE of notes, not a stationary tone: stationary
            # signals collapse to one distinct frame hash, which can
            # never reach min_matches
            rng = np.random.RandomState(seed)
            segs = []
            for f in notes:
                t = np.arange(sr // 4, dtype=np.float64) / sr
                segs.append(np.sin(2 * np.pi * f * t))
            w = np.concatenate(segs) * amp
            if noise:
                w = w + rng.normal(0, noise * amp, len(w))
            return np.clip(w, -32767, 32767).astype(np.int16)

        mel_a = [440, 550, 660, 880, 520, 720, 610, 470]
        mel_b = [1200, 1500, 1900, 2300, 1350, 1750, 2100, 1600]
        rows = [
            # 0: melody A; 1: same melody, lower amplitude + mild noise
            (0, "audio", "audio/wav", bytearray(encode_wav(melody(mel_a), sr)), None, None, 2000),
            (1, "audio", "audio/wav", bytearray(encode_wav(melody(mel_a, amp=5000, noise=0.02, seed=3), sr)), None, None, 2000),
            # 2: unrelated melody
            (2, "audio", "audio/wav", bytearray(encode_wav(melody(mel_b), sr)), None, None, 2000),
            # 3: an image row — must be ignored, not crash
            (3, "image", "image/bmp", bytearray(b"BMnotreally"), 4, 4, None),
        ]
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_duplicate_found_unrelated_not(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
            audio_near_dup_pairs,
        )

        media = self._media(spark)
        pairs = {
            (r.id_a, r.id_b): r.n_matches
            for r in audio_near_dup_pairs(media, min_matches=3).collect()
        }
        assert (0, 1) in pairs          # scaled+noisy copy is caught
        assert (0, 2) not in pairs      # unrelated tone is not
        assert (1, 2) not in pairs

    def test_fingerprint_amplitude_invariance(self, spark):
        """Pure rescaling yields the IDENTICAL fingerprint set."""
        import numpy as np
        from ai_vector_database_converstion_from_pdf_spark.functions.audiocodec import (
            encode_wav,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            audio_fingerprints,
        )

        sr = 8000
        t = np.arange(sr, dtype=np.float64) / sr
        w = np.sin(2 * np.pi * 330 * t)
        rows = [
            (0, "audio", "audio/wav", bytearray(encode_wav((w * 16000).astype(np.int16), sr)), None, None, 1000),
            (1, "audio", "audio/wav", bytearray(encode_wav((w * 4000).astype(np.int16), sr)), None, None, 1000),
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        fp = audio_fingerprints(media).collect()
        a = {r.fp_hash for r in fp if r.media_id == 0}
        b = {r.fp_hash for r in fp if r.media_id == 1}
        assert a and a == b


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


class TestSemDeDup:
    def test_keeper_is_farthest_from_centroid(self, spark):
        """Planted duplicate group: the member with the LOWEST cosine to
        its centroid is kept (diversity rule), others dropped."""
        import numpy as np
        from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
            semdedup_prune,
        )

        rng = np.random.RandomState(42)
        base = rng.normal(size=(4, 8))
        rows = []
        # ids 0..3: well-separated singletons (they seed the centroids)
        for i in range(4):
            v = base[i] / np.linalg.norm(base[i])
            rows.append((i, [float(x) for x in v]))
        # ids 10..12: near-copies of base[0] with growing perturbation
        for j, eps in enumerate([0.01, 0.02, 0.3]):
            v = base[0] + eps * rng.normal(size=8)
            v = v / np.linalg.norm(v)
            rows.append((10 + j, [float(x) for x in v]))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semdedup_prune(emb, n_clusters=4, tau=0.9)
        got = {r.vec_id: (r.component, r.ccos, r.keep) for r in out.collect()}
        # the dup group = {0, 10, 11} (12 is perturbed past tau or kept
        # separately); exactly one keeper per component, and the keeper
        # has the group's minimal centroid cosine
        comps = {}
        for vid, (comp, ccos, keep) in got.items():
            comps.setdefault(comp, []).append((vid, ccos, keep))
        assert comps, got
        for comp, members in comps.items():
            keepers = [m for m in members if m[2]]
            assert len(keepers) == 1
            assert keepers[0][1] == min(m[1] for m in members)
        # vectors 0 and 10 (eps=0.01 copies) must share a component
        assert got[0][0] == got[10][0]

    def test_pairs_are_cluster_scoped(self, spark):
        """Vectors similar across DIFFERENT clusters are not paired —
        the documented approximation that buys the c_i^2 cost bound."""
        from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
            semdedup_prune,
        )

        # two centroids at 90 degrees; two probes each closest to a
        # DIFFERENT centroid but 0.995-similar to each other
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.72, 0.69, 0.0, 0.0]),
            (3, [0.69, 0.72, 0.0, 0.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semdedup_prune(emb, n_clusters=2, tau=0.99)
        comps = {r.vec_id for r in out.collect()}
        assert 2 not in comps and 3 not in comps


class TestAsofNullAndDate:
    def test_nearest_matches_rows_not_nonnull_values(self, spark):
        """The matched ts and value must come from the SAME right row:
        a null-valued right row at ts=95 IS the backward match for
        left ts=100 (DuckDB ASOF row semantics), so nearest returns
        its (null) value rather than pairing ts=95 with an older
        value and mis-computing the delta."""
        from ai_vector_database_converstion_from_pdf_spark.operators.asof import (
            asof_join,
        )

        left = spark.createDataFrame([(1, 100)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 95, None), (1, 80, 5.0), (1, 107, 7.0)],
            "k long, ts long, rv double",
        )
        out = asof_join(
            left, right, key="k", ts_col="ts", right_value_col="rv",
            direction="nearest",
        )
        # nearest row is ts=95 (delta 5 < 7); its value is null
        assert out.collect()[0].asof_value is None

    def test_nearest_with_date_ts(self, spark):
        """DATE ts columns must not silently degrade the delta math
        (cast(date as double) is NULL in Spark)."""
        import datetime as dt
        from ai_vector_database_converstion_from_pdf_spark.operators.asof import (
            asof_join,
        )

        d = dt.date
        left = spark.createDataFrame([(1, d(2024, 6, 10))], "k long, ts date")
        right = spark.createDataFrame(
            [(1, d(2024, 6, 8), 8.0), (1, d(2024, 6, 18), 18.0)],
            "k long, ts date, rv double",
        )
        out = asof_join(
            left, right, key="k", ts_col="ts", right_value_col="rv",
            direction="nearest",
        )
        # backward match is 2 days away, forward is 8 -> 8.0
        assert out.collect()[0].asof_value == 8.0


class TestTriangleSampling:
    def test_doulion_estimate_tracks_exact(self, spark):
        """DOULION edge-sampled totals approximate the exact global
        triangle count on a moderately dense random graph."""
        import random

        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            triangle_counts,
        )

        rng = random.Random(7)
        n = 60
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.4
        ]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        exact_total = (
            sum(r.triangles for r in triangle_counts(df).collect()) // 3
        )
        est_rows = triangle_counts(df, sample_p=0.5).collect()
        est_total = sum(r.triangles_est for r in est_rows) / 3
        assert exact_total > 100  # the graph is actually dense
        # unbiased estimator; at p=0.5 on ~700 edges allow 40% band
        assert abs(est_total - exact_total) < exact_total * 0.4

    def test_sampling_is_deterministic(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            triangle_counts,
        )

        edges = [(a, b) for a in range(30) for b in range(a + 1, 30)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        a = sorted(
            (r.id, r.triangles_est)
            for r in triangle_counts(df, sample_p=0.3).collect()
        )
        b = sorted(
            (r.id, r.triangles_est)
            for r in triangle_counts(
                df.repartition(5), sample_p=0.3
            ).collect()
        )
        assert a == b


class TestKCore:
    def test_peel_rounds_on_known_graph(self, spark):
        """Chain + clique: chain ends peel in round 1, the next layer
        in round 2; the 4-clique survives 3-core peeling intact."""
        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            kcore_peel,
        )

        k4 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
        chain = [(1, 2), (2, 3), (3, 10)]
        df = spark.createDataFrame(k4 + chain, "id_a long, id_b long")
        got = {
            r.id: (r.peel_round, r.deg_final)
            for r in kcore_peel(df, k=3, n_rounds=3).collect()
        }
        # chain nodes: 1 (deg 1), 2 (deg 2), 3 (deg 2) all peel round 1
        assert got[1][0] == 1 and got[2][0] == 1 and got[3][0] == 1
        # clique nodes survive with internal degree 3 (node 10 loses its
        # chain edge when 3 peels)
        for n in (10, 11, 12, 13):
            assert got[n][0] is None and got[n][1] == 3


# ---------------------------------------------------------------------------
# streaming DSIR scoring
# ---------------------------------------------------------------------------


class TestStreamingDsir:
    def test_stream_scores_equal_batch(self, spark, tmp_path):
        """Frozen-lambda streaming scores == the batch shuffle-based
        scorer on the same docs (exact integer arithmetic both ways)."""
        from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
            dsir_importance_weights,
            dsir_lambda,
        )
        from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
            run_to_memory,
            streaming_dsir_score,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        target = docs.filter(F.col("lang") == "en")
        batch = {
            r.doc_id: (r.n_tokens, r.weight)
            for r in dsir_importance_weights(docs, target).collect()
        }
        lam_rows = dsir_lambda(docs, target).collect()

        src_dir = str(tmp_path / "dsir_stream_src")
        docs.write.parquet(src_dir)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(src_dir)
        )
        scored = streaming_dsir_score(stream, lam_rows)
        run_to_memory(scored, "dsir_scored")
        got = {
            r.doc_id: (r.n_tokens, r.weight)
            for r in spark.sql("select * from dsir_scored").collect()
            if r.n_tokens > 0
        }
        batch_nonempty = {k: v for k, v in batch.items() if v[0] > 0}
        assert got == batch_nonempty

    def test_unseen_tokens_score_zero(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
            dsir_score_expr,
        )

        df = spark.createDataFrame(
            [(1, "zzzzqqqq wwwwxxxx")], "doc_id long, text string"
        )
        out = df.select(dsir_score_expr(F.col("text"), {}).alias("s")).collect()
        assert out[0].s.weight == 0.0 and out[0].s.n_tokens == 2


# ---------------------------------------------------------------------------
# retrieval metrics
# ---------------------------------------------------------------------------


class TestRetrievalMetrics:
    def test_hand_computed_metrics(self, spark):
        import math

        from ai_vector_database_converstion_from_pdf_spark.operators.evalmetrics import (
            retrieval_metrics,
        )

        # q1: rel docs {10, 11, 12}; retrieved hits at ranks 1 and 3
        # q2: rel docs {20};         no hit in top-k
        rankings = spark.createDataFrame(
            [(1, 10, 1), (1, 99, 2), (1, 12, 3), (2, 98, 1), (2, 97, 2)],
            "q_id long, doc_id long, rank long",
        )
        qrels = spark.createDataFrame(
            [(1, 10), (1, 11), (1, 12), (2, 20)], "q_id long, doc_id long"
        )
        got = {
            r.q_id: r.asDict()
            for r in retrieval_metrics(rankings, qrels, k=10).collect()
        }
        m1 = got[1]
        assert m1["n_rel"] == 3 and m1["hits_at_k"] == 2
        assert m1["recall_at_k"] == pytest.approx(2 / 3, abs=1e-6)
        assert m1["mrr"] == 1.0
        dcg = round(round(1 / math.log2(2), 6) * 1e6) + round(
            round(1 / math.log2(4), 6) * 1e6
        )
        idcg = sum(
            round(round(1 / math.log2(i + 1), 6) * 1e6) for i in (1, 2, 3)
        )
        assert m1["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)
        m2 = got[2]
        assert (
            m2["hits_at_k"] == 0
            and m2["mrr"] == 0.0
            and m2["ndcg_at_k"] == 0.0
            and m2["recall_at_k"] == 0.0
        )

    def test_perfect_ranking_scores_one(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.evalmetrics import (
            retrieval_metrics,
        )

        rankings = spark.createDataFrame(
            [(1, d, r) for r, d in enumerate([5, 6, 7], start=1)],
            "q_id long, doc_id long, rank long",
        )
        qrels = spark.createDataFrame(
            [(1, 5), (1, 6), (1, 7)], "q_id long, doc_id long"
        )
        m = retrieval_metrics(rankings, qrels, k=10).collect()[0]
        assert m.recall_at_k == 1.0 and m.mrr == 1.0
        assert m.ndcg_at_k == pytest.approx(1.0, abs=1e-6)


class TestFrozenProbe:
    def test_frozen_scores_track_batch(self, spark):
        """probe_score_expr over exported weights approximates the
        batch scorer (per-feature micro-rounding differs, so approx)
        and preserves the label separation."""
        from ai_vector_database_converstion_from_pdf_spark.operators.linear import (
            collect_weights,
            logistic_probe,
            probe_score_expr,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        label = F.col("lang") == "en"
        batch = {r.id: r.score for r in logistic_probe(docs, label).collect()}
        w = collect_weights(docs, label)
        frozen = {
            r.doc_id: r.s
            for r in docs.select(
                "doc_id", probe_score_expr(F.col("text"), w).alias("s")
            ).collect()
        }
        common = set(batch) & set(frozen)
        assert len(common) >= len(batch) * 0.9
        for i in common:
            assert abs(batch[i] - frozen[i]) < 1e-3, (i, batch[i], frozen[i])

    def test_empty_model_scores_half(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.linear import (
            probe_score_expr,
        )

        df = spark.createDataFrame([(1, "some words here")], "doc_id long, text string")
        out = df.select(probe_score_expr(F.col("text"), {}).alias("s")).collect()
        assert out[0].s == 0.5


class TestExportJsonl:
    def test_jsonl_roundtrip(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine

        eng = PvdbEngine(
            spark, str(tmp_path / "ws_jsonl"), dim=16,
            asof="2024-06-01 00:00:00",
        )
        docs = spark.createDataFrame(
            [(1, 'alpha "quoted" beta'), (2, "newline\ncarrier gamma")],
            "doc_id long, text string",
        )
        eng.index_documents(docs)
        out = str(tmp_path / "export.jsonl")
        eng.workspace.export_jsonl(out, with_embeddings=True)
        back = spark.read.json(out)
        rows = {r.id: r for r in back.collect()}
        assert set(rows) == {1, 2}
        assert rows[1].text == 'alpha "quoted" beta'
        assert rows[2].text == "newline\ncarrier gamma"
        assert len(rows[1].embedding) == 16


class TestExportOrc:
    def test_orc_roundtrip(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine

        eng = PvdbEngine(
            spark, str(tmp_path / "ws_orc"), dim=16,
            asof="2024-06-01 00:00:00",
        )
        docs = spark.createDataFrame(
            [(1, 'alpha "quoted" beta'), (2, "newline\ncarrier gamma")],
            "doc_id long, text string",
        )
        eng.index_documents(docs)
        out = str(tmp_path / "export.orc")
        eng.workspace.export_orc(out)
        back = spark.read.orc(out)
        rows = {r.id: r for r in back.collect()}
        assert set(rows) == {1, 2}
        assert rows[2].text == "newline\ncarrier gamma"
        assert len(rows[1].embedding) == 16
