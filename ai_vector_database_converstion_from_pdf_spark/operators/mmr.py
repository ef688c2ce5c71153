"""Q11/Q12 — adaptive MMR diversification + exploration injection.

Reference: `vector_store.cpp:460-554`. Both operate on the already-
collected fused top-k (≤ limit×6 ≈ 30 rows) — the greedy selection is
inherently sequential and tiny, so it runs driver-side with exact
reference semantics (SURVEY §4: "collect to driver and iterate,
exactness preserved"). The corpus never flows through here.

State (`MmrState`): session EMA of document-distribution entropy
(α=0.3 for the first 10 searches, then 0.1, `vector_store.cpp:481-483`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class MmrState:
    avg_doc_entropy: float = 0.0
    session_search_count: int = 0

    def update_entropy(self, current: float) -> float:
        alpha = 0.3 if self.session_search_count < 10 else 0.1
        self.avg_doc_entropy = alpha * current + (1 - alpha) * self.avg_doc_entropy
        self.session_search_count += 1
        return self.avg_doc_entropy


def query_complexity(query_text: str, intent: str) -> float:
    """words/10 (+0.5 for summary/procedure) (`vector_store.cpp:465-466`).
    Note: Qt's split(" ") counts empty segments; Python's split(" ")
    matches that for single-space-separated text."""
    c = len(query_text.split(" ")) / 10.0
    if intent in ("summary", "procedure"):
        c += 0.5
    return c


def mmr_lambda(query_text: str, intent: str) -> float:
    """sigmoid(5·(complexity−0.5)) clamped to [0.2, 0.8]
    (`vector_store.cpp:467-468`)."""
    c = query_complexity(query_text, intent)
    lam = 1.0 / (1.0 + math.exp(-5.0 * (c - 0.5)))
    return max(0.2, min(0.8, lam))


def doc_entropy(rows: list[dict], doc_key: str = "doc_id") -> float:
    """Shannon entropy (bits) of the doc distribution
    (`vector_store.cpp:470-478`)."""
    if not rows:
        return 0.0
    counts: dict = {}
    for r in rows:
        counts[r[doc_key]] = counts.get(r[doc_key], 0) + 1
    n = len(rows)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def mmr_select(
    rows: list[dict],
    limit: int,
    lam: float,
    avg_entropy: float,
    doc_key: str = "doc_id",
    path_key: str = "heading_path",
    score_key: str = "score",
) -> tuple[list[dict], float]:
    """Greedy selection maximizing λ·score − (1−λ)·penalty, penalty =
    0.15·(1.1−avgEntropy) for a repeated doc + 0.1 for a repeated heading
    path (`vector_store.cpp:487-529`). Top-1 always kept. Returns
    (selected rows, total penalty incurred)."""
    if len(rows) <= 1:
        return list(rows), 0.0
    remaining = list(rows)
    selected = [remaining.pop(0)]
    seen_docs = {selected[0].get(doc_key)}
    seen_paths = {selected[0].get(path_key)}
    penalty_total = 0.0
    while len(selected) < limit and remaining:
        best_idx, best_score, best_pen = -1, -1e9, 0.0
        for i, cand in enumerate(remaining):
            pen = 0.0
            if cand.get(doc_key) in seen_docs:
                pen += 0.15 * (1.1 - avg_entropy)
            if cand.get(path_key) in seen_paths:
                pen += 0.1
            mmr = lam * cand[score_key] - (1.0 - lam) * pen
            if mmr > best_score:
                best_idx, best_score, best_pen = i, mmr, pen
        if best_idx < 0:
            break
        chosen = remaining.pop(best_idx)
        penalty_total += best_pen
        selected.append(chosen)
        seen_docs.add(chosen.get(doc_key))
        seen_paths.add(chosen.get(path_key))
    return selected, penalty_total


def exploration_inject(
    final_rows: list[dict],
    semantic_rows: list[dict],
    limit: int,
    stability: float,
    intent: str,
    enabled: bool = True,
    trust_key: str = "trust_score",
    score_key: str = "score",
    sim_key: str | None = None,
) -> tuple[list[dict], bool]:
    """Q12 (`vector_store.cpp:533-554`): if stability ≥ 0.6 and intent is
    not definition/procedure, the first semantic candidate beyond the
    top-limit with trust ≤ 1.0 and similarity > 0.65 is flagged and
    inserted at position 2 with score = top1·0.95.

    `semantic_rows` must be the SEMANTIC-branch candidates ordered by
    semantic rank, and the 0.65 threshold applies to their cosine
    similarity (`sim_key`, falling back to `score_key`) — fused RRF
    scores are bounded ~1/61 and would never pass it."""
    if (
        not enabled
        or stability < 0.6
        or not final_rows
        or intent in ("definition", "procedure")
    ):
        return final_rows, False
    out = list(final_rows)
    simk = sim_key or score_key
    for cand in semantic_rows[limit:]:
        if cand.get(trust_key, 1.0) <= 1.0 and (cand.get(simk) or 0.0) > 0.65:
            probe = dict(cand)
            probe["is_exploration"] = True
            probe[score_key] = out[0][score_key] * 0.95
            out.insert(1, probe)
            return out[:limit] if len(out) > limit else out, True
    return out, False
