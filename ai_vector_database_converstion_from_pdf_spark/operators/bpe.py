"""Distributed byte-pair-encoding (BPE) vocabulary learning.

Tokenizer training is the step every LLM data pipeline runs between
curation and packing; this is the Sennrich et al. (ACL'16) word-level BPE
learner expressed Spark-first:

- **One corpus-sized shuffle, ever**: the corpus collapses to a
  (word, freq) table up front. Every merge iteration thereafter runs over
  that vocabulary-sized table — at 100 TB the corpus might be billions of
  rows but the word vocabulary is tens of millions, so the iterative part
  never touches the corpus again.
- **Per-iteration work**: adjacent symbol pairs are exploded JVM-side
  (slice + arrays_zip, no Python), summed with map-side combine
  (vocabulary-sized shuffle on the pair key), and the argmax pair is one
  driver scalar (the sanctioned ≤1-row collect). The merge itself is a
  pure ``F.aggregate`` left fold — codegen'd, no UDF.
- **Bounded lineage**: the vocab frame is localCheckpoint'ed each
  iteration so 50 merges don't build a 50-deep nested-expression plan.

Determinism contract: ties on pair count break by (left, right) symbol
order; the whole procedure is a deterministic function of the corpus, so
the catalog entries are golden-VALUES oracles (the same class as the
chunker) and `tests/test_bpe.py` re-derives them against an independent
pure-Python reference implementation.

Reference: the reference app has no tokenizer trainer; this is a
training-pipeline extension (SURVEY.md §6, BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens

END = "</w>"  # end-of-word sentinel symbol (Sennrich-style)


def word_frequencies(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) over the tokenized corpus — the single corpus-sized
    aggregation; everything downstream is vocabulary-sized."""
    out = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def _init_symbols(vocab: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + the END sentinel."""
    # between-char split; Java split keeps a trailing "" (the lookahead
    # matches at end-of-string), so strip empties explicitly
    chars = F.filter(F.split(F.col("word"), "(?!^)"), lambda s: s != "")
    return vocab.withColumn("syms", F.concat(chars, F.array(F.lit(END))))


def _merge_fold(left: str, right: str):
    """Left fold applying ONE merge rule left-to-right, non-overlapping:
    push each symbol; if the top of the stack is (left) and the incoming
    symbol is (right), replace the top with the merged symbol."""
    merged = left + right

    def step(acc, s):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return lambda syms: F.aggregate(
        syms, F.array().cast("array<string>"), step
    )


def bpe_train(
    vocab: DataFrame,
    n_merges: int,
    stop_below: int = 2,
    batch_size: int = 1,
    accept: str = "prefix",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` merge rules. Returns (merges, final_vocab)
    where merges = [(left, right, pair_freq_at_merge_time), ...] in rank
    order and final_vocab carries the trained segmentation per word.

    Stops early when no adjacent pair reaches ``stop_below`` total
    frequency (merging hapax pairs adds vocabulary without compression).

    ``batch_size`` (VERDICT r7 #4): accept up to that many merges per
    pair-count round instead of one — at a real 32k-merge vocabulary the
    sequential loop is 32k Spark jobs, so cutting round-trips ~batch×
    is the difference between hours and minutes of driver latency.
    The round rule keeps the result a deterministic pure function of
    the corpus: rank pairs by (count desc, left, right) and accept the
    MAXIMAL PREFIX that is pairwise symbol-disjoint — no accepted
    pair's left/right/minted symbol may collide with an earlier
    accepted pair's left/right/minted symbol. Disjoint merges commute
    (neither can create, destroy, or retokenize the other's sites), so
    applying the prefix in rank order is well-defined; the prefix stops
    at the first interaction because a merge CAN change the counts of
    pairs that share its symbols, and a pair minted by the top merge
    (e.g. ("ab","</w>") right after ("a","b")) can legitimately outrank
    the rest of the table — only a fresh count round sees that.

    ``accept="scan"`` relaxes the prefix stop to a greedy rank-ordered
    independent set: scan the ranked table (a bounded lookahead of
    4*batch rows), SKIP pairs that interact with an already-accepted
    one, keep accepting until batch_size merges or the lookahead ends.
    Still deterministic and still commuting-disjoint within a round,
    but a skipped high-rank pair waits for the next round while
    lower-ranked disjoint pairs merge first — a larger departure from
    the classic order than prefix mode, in exchange for near-M
    acceptance on chain-heavy text where the prefix stops at ~2
    (measured: hex-vocab acceptance ~1.8/round prefix vs ~batch with
    scan). Use prefix when merge-order fidelity matters, scan when
    driver round-trips do.

    ``batch_size=1`` (the default, and what the golden-oracled catalog
    entries use) is byte-identical to the classic Sennrich sequential
    algorithm under EITHER accept mode: both degenerate to the argmax.
    ``batch_size>1`` is the scale path; it may pick a different (still
    deterministic, still valid-BPE) merge order when consecutive ranks
    interact. tests/test_bpe.py re-derives both against independent
    pure-Python references.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if accept not in ("prefix", "scan"):
        raise ValueError(f"accept must be 'prefix' or 'scan', got {accept!r}")
    cur = _init_symbols(vocab).select("word", "freq", "syms").localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        multi = cur.filter(F.size("syms") >= 2)
        lefts = F.slice(F.col("syms"), 1, F.size("syms") - 1)
        rights = F.slice(F.col("syms"), 2, F.size("syms") - 1)
        pairs = multi.select(
            "freq", F.explode(F.arrays_zip(lefts.alias("l"), rights.alias("r"))).alias("p")
        ).select(
            F.col("p.l").alias("l"), F.col("p.r").alias("r"), "freq"
        )
        want = min(batch_size, n_merges - len(merges))
        lookahead = want if accept == "prefix" else max(4 * want, want)
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(lookahead)
            .collect()
        )
        if not top or top[0]["cnt"] < stop_below:
            break
        touched: set[str] = set()
        accepted: list[tuple[str, str, int]] = []
        for row in top:
            if row["cnt"] < stop_below or len(accepted) >= want:
                break
            l, r, m = row["l"], row["r"], row["l"] + row["r"]
            if {l, r, m} & touched:
                if accept == "prefix":
                    break  # maximal disjoint PREFIX — stop at interaction
                continue  # scan mode: skip the conflict, keep scanning
            touched |= {l, r, m}
            accepted.append((l, r, int(row["cnt"])))
        merges.extend(accepted)
        col = F.col("syms")
        for left, right, _cnt in accepted:
            col = _merge_fold(left, right)(col)
        # one checkpoint per ROUND, not per merge: lineage and job count
        # both shrink ~batch× on non-interacting stretches
        cur = cur.withColumn("syms", col).localCheckpoint()
        # progress is guaranteed (the top-ranked pair is always accepted);
        # exhaustion is detected by the next round's count falling below
        # stop_below, exactly like the sequential loop
    return merges, cur


def encode_udf(merges: list[tuple[str, str, int]]):
    """mapInPandas generator applying the learned merge table (GPT-2
    style: repeatedly merge the lowest-rank adjacent pair) to a stream of
    (id, text) rows → (id, n_tokens, n_chars). The rank dict rides the
    closure — broadcast once per executor, O(|merges|) memory."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def encode_word(word: str) -> int:
        syms = list(word) + [END]
        while len(syms) >= 2:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            rank, _ = min(cand)
            l, r = merges[rank][0], merges[rank][1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    import re

    tok_re = re.compile("[^a-z0-9]+")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n_tok = []
            for text in pdf["text"].astype(str):
                words = [w for w in tok_re.split(text.lower()) if w]
                n_tok.append(sum(encode_word(w) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy("int64"),
                    "n_bpe_tokens": pd.Series(n_tok, dtype="int64"),
                    "n_chars": pdf["text"].astype(str).str.len().astype("int64"),
                }
            )

    return gen


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Per-document BPE token counts under a trained merge table — the
    'token budget' column packing and pricing run on. Map-side only."""
    return docs.select("doc_id", "text").mapInPandas(
        encode_udf(merges), "doc_id long, n_bpe_tokens long, n_chars long"
    )
