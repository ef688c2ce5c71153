"""R1-R5 — LLM cross-encoder rerank with calibration (SURVEY §2.5).

Reference: `LocalRerankClient` (`gemini_api.cpp:22-210`): top-10
candidates (500-char prefixes) scored 0-1 by an LLM at temperature 0;
scores z-normalized against EMA mean/std (α=0.15) with outlier rejection
(|z|>5), clamp ±3, sigmoid; drift >0.4 after 5 samples resets stats;
near-zero variance batches flag a "frozen model" and skip calibration;
calibrated scores joined back by chunk id, sorted, top-5; empty rerank ⇒
original order (`gemini_api.cpp:741-781`).

Spark shape: the per-query rerank operates on ≤10 collected rows (the
reference ships them in ONE prompt — inherently driver-sized), so the
candidate loop is driver-side by design. The corpus-scale path is
`batch_score` — an Arrow-batched pandas UDF suitable for scoring
millions of (query, doc) pairs distributively. The scorer is pluggable;
the deterministic stub (FIXTURES.md §C) stands in for the LLM.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass, field

# pandas must be a MODULE-level import: the pandas_udf builders below
# declare `pd.Series` type hints, and with postponed annotation
# evaluation those strings resolve against module globals at
# decoration time — a function-local import raises
# UNSUPPORTED_SIGNATURE.
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ALPHA = 0.15          # gemini_api.cpp:39
DRIFT_THRESHOLD = 0.4  # :32
DRIFT_MIN_SAMPLES = 5  # :29
OUTLIER_Z = 5.0        # :64
CLAMP_Z = 3.0          # :65
MIN_VARIANCE = 0.001   # :206
PREFIX_CHARS = 500     # :85
RERANK_IN = 10         # mainwindow.cpp:566
RERANK_OUT = 5         # gemini_api.cpp:79


def stub_score(query: str, text: str) -> float:
    """Deterministic LLM stand-in: token-overlap ratio with a small
    md5-derived jitter — stable across processes and platforms."""
    qt = set(t for t in re.split(r"[^a-z0-9]+", query.lower()) if t)
    dt = set(t for t in re.split(r"[^a-z0-9]+", text.lower()) if t)
    overlap = len(qt & dt) / len(qt) if qt else 0.0
    h = int(hashlib.md5((query + "\x00" + text).encode()).hexdigest()[:8], 16)
    jitter = (h % 1000) / 10000.0  # [0, 0.1)
    return min(1.0, 0.85 * overlap + jitter)


@dataclass
class Calibrator:
    """R2-R4 rolling z-score calibration with drift reset and frozen-model
    guard. Cross-batch state; persist via to_kv/from_kv into the
    workspace_metadata table (`mainwindow.cpp:499-503`)."""

    mean: float = 0.0
    std: float = 0.01
    sample_count: int = 0
    anomalies: list[str] = field(default_factory=list)

    def check_consistency(self, scores: list[float]) -> bool:
        if not scores:
            return True
        var = sum((s - 0.5) ** 2 for s in scores)
        return var >= MIN_VARIANCE

    def update_stats(self, scores: list[float]) -> None:
        if not scores:
            return
        batch_mean = sum(scores) / len(scores)
        if self.sample_count > DRIFT_MIN_SAMPLES:
            if abs(batch_mean - self.mean) > DRIFT_THRESHOLD:
                self.anomalies.append("drift-reset")
                self.sample_count = 0
        if self.sample_count == 0:
            self.mean = batch_mean
        else:
            self.mean = (1 - ALPHA) * self.mean + ALPHA * batch_mean
        batch_std = math.sqrt(
            sum((s - self.mean) ** 2 for s in scores) / len(scores)
        )
        if self.sample_count == 0:
            self.std = max(0.01, batch_std)
        else:
            self.std = (1 - ALPHA) * self.std + ALPHA * max(0.01, batch_std)
        self.sample_count += 1

    def normalize(self, raw: float) -> float | None:
        z = (raw - self.mean) / self.std
        if abs(z) > OUTLIER_Z:
            return None  # reject outlier (gemini_api.cpp:64)
        z = max(-CLAMP_Z, min(CLAMP_Z, z))
        return 1.0 / (1.0 + math.exp(-z))

    def to_kv(self, model: str) -> dict[str, str]:
        return {f"{model}_mean": repr(self.mean), f"{model}_std": repr(self.std)}

    @classmethod
    def from_kv(cls, model: str, kv: dict[str, str]) -> "Calibrator":
        mean = float(kv.get(f"{model}_mean", 0.0))
        std = float(kv.get(f"{model}_std", 0.0))
        if std > 0:
            return cls(mean=mean, std=std, sample_count=10)  # gemini_api.cpp:190
        return cls()


def rerank_rows(
    query: str,
    candidates: list[dict],
    topk: int = RERANK_OUT,
    calibrator: Calibrator | None = None,
    scorer=stub_score,
) -> list[dict]:
    """R1+R5 over collected candidates (each dict needs id, text, score).
    Returns rows with rerank_score, sorted desc (tie: original rank asc);
    empty calibrated set ⇒ original order preserved (fallback,
    `gemini_api.cpp:774-778`)."""
    cal = calibrator or Calibrator()
    raw = [scorer(query, (c.get("text") or "")[:PREFIX_CHARS]) for c in candidates]
    if cal.check_consistency(raw):
        cal.update_stats(raw)
    else:
        cal.anomalies.append("frozen-model")
    out = []
    for i, (c, r) in enumerate(zip(candidates, raw)):
        s = cal.normalize(r)
        if s is None:
            continue
        out.append({**c, "rerank_score": s, "original_rank": i})
    if not out:
        return list(candidates)
    out.sort(key=lambda d: (-d["rerank_score"], d["original_rank"]))
    return out[:topk]


def rerank_topk(
    candidates: DataFrame,
    query: str,
    topk: int = RERANK_OUT,
    n_in: int = RERANK_IN,
    id_col: str = "id",
    text_col: str = "text",
    score_col: str = "score",
    calibrator: Calibrator | None = None,
) -> DataFrame:
    """DataFrame wrapper: take the top n_in candidates (already ranked),
    rerank driver-side, return a small result DataFrame."""
    spark = candidates.sparkSession
    rows = [
        {"id": r[id_col], "text": r[text_col], "score": r[score_col]}
        for r in candidates.orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        ).limit(n_in).collect()
    ]
    res = rerank_rows(query, rows, topk, calibrator)
    out = [
        (r["id"], r.get("rerank_score", r["score"]), i + 1)
        for i, r in enumerate(res)
    ]
    return spark.createDataFrame(out, f"{id_col} long, rerank_score double, rerank_rank long")


def batch_score(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    endpoint: str | None = None,
    model: str | None = None,
) -> DataFrame:
    """Corpus-scale rerank scoring: Arrow-batched pandas UDF. With no
    endpoint the deterministic stub scores locally; with `endpoint` +
    `model` each Arrow batch POSTs ONE /v1/rerank call through
    HttpRerankProvider (the Cohere/Jina/bge wire shape) — so a corpus of
    N candidates costs N / arrow_batch_size HTTP round trips, not N
    (vs the reference's one-candidate-in-flight loop,
    `gemini_api.cpp:79-178`). Scale shape: scoring is map-side only —
    no shuffle, cost strictly linear in candidates; the executor-side
    provider is constructed per task from the (endpoint, model)
    strings, so nothing unpicklable rides the closure."""
    from pyspark.sql.types import DoubleType

    if endpoint is not None:
        if model is None:
            raise ValueError("batch_score with endpoint requires model")

        @F.pandas_udf(DoubleType())
        def score(batch: pd.Series) -> pd.Series:
            from ..functions.providers import HttpRerankProvider

            prov = HttpRerankProvider(endpoint, model)
            docs = [(t or "")[:PREFIX_CHARS] for t in batch]
            return pd.Series(prov.score_batch(query, docs), index=batch.index)

    else:

        @F.pandas_udf(DoubleType())
        def score(batch: pd.Series) -> pd.Series:
            return batch.map(lambda t: stub_score(query, (t or "")[:PREFIX_CHARS]))

    return df.withColumn("rerank_raw", score(F.col(text_col)))
