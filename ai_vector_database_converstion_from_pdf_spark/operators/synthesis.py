"""Y1-Y4 — multi-hop answer synthesis (SURVEY §2.6).

Reference: `GeminiApi::synthesizeResponse` (`gemini_api.cpp:379-567`):
greedy single-link clustering of the top-5 contexts at cosine > 0.85 →
FACT UNIT prompt → LLM (temperature 0) → brace-balance guard → claim
parse → citation validation → confidence = mean finalScore of cited
sources (fallback top1·0.5).

Spark shape: the per-query path operates on ≤5 contexts (driver-side,
exact greedy order preserved). The corpus-scale variant
`cluster_embeddings_df` builds the same single-link clusters over an
arbitrary-size set via a threshold self-join + iterative label
propagation (connected components by min-label convergence) — the
standard Spark CC pattern. The LLM call is a pluggable function; the
deterministic stub cites every source of each fact unit.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

CLUSTER_THRESHOLD = 0.85  # gemini_api.cpp:403


def _cos(a, b) -> float:
    if not a or not b or len(a) != len(b):
        return 0.0
    dot = n1 = n2 = 0.0
    for x, y in zip(a, b):
        dot += x * y
        n1 += x * x
        n2 += y * y
    return dot / (math.sqrt(n1) * math.sqrt(n2)) if n1 > 0 and n2 > 0 else 0.0


def greedy_cluster(embeddings: list[list[float]], threshold: float = CLUSTER_THRESHOLD) -> list[list[int]]:
    """Y1 index-ordered greedy single-link clustering — exact reference
    semantics (`gemini_api.cpp:390-409`): i absorbs every unassigned j>i
    with cos(i,j) > threshold; absorbed members do NOT extend the link."""
    clusters: list[list[int]] = []
    assigned: set[int] = set()
    for i in range(len(embeddings)):
        if i in assigned:
            continue
        cur = [i]
        assigned.add(i)
        for j in range(i + 1, len(embeddings)):
            if j in assigned:
                continue
            if _cos(embeddings[i], embeddings[j]) > threshold:
                cur.append(j)
                assigned.add(j)
        clusters.append(cur)
    return clusters


def cluster_embeddings_df(
    embeddings: DataFrame,
    threshold: float = CLUSTER_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iters: int = 20,
) -> DataFrame:
    """Scalable single-link clustering: (id, cluster_id) where cluster_id
    is the min id reachable via cos>threshold edges (true connected
    components — a superset of the reference's order-dependent greedy,
    which is only defined for small k). Iterative min-label propagation;
    each round is one join + groupBy over the edge list."""
    from .dedup import embedding_near_dup_pairs

    from .graph import connected_components

    edges = embedding_near_dup_pairs(embeddings, threshold, id_col, vec_col).select(
        "id_a", "id_b"
    )
    nodes = embeddings.select(F.col(id_col).alias("id"))
    cc = connected_components(nodes, edges, max_iters=max_iters)
    return cc.select("id", F.col("component").alias("cluster_id"))


@dataclass
class SourceContext:
    prompt_index: int
    doc_name: str
    trust_score: float
    chunk_text: str
    final_score: float
    embedding: list[float] = field(default_factory=list)


def fact_unit_block(contexts: list[SourceContext], clusters: list[list[int]]) -> str:
    """Y2 prompt context block (`gemini_api.cpp:420-434`)."""
    out = []
    for i, cluster in enumerate(clusters):
        out.append(f"[FACT UNIT {i + 1}]")
        for idx in cluster:
            c = contexts[idx]
            out.append(
                f"- Source [{c.prompt_index}] ({c.doc_name}, Trust: {c.trust_score:.2f}): {c.chunk_text}"
            )
        out.append("")
    return "\n".join(out)


def stub_synthesizer(query: str, contexts: list[SourceContext], clusters: list[list[int]]) -> str:
    """Deterministic LLM stand-in: one claim per fact unit citing all its
    sources (valid JSON, same contract as the reference's prompt)."""
    answer = []
    for cluster in clusters:
        srcs = [contexts[i].prompt_index for i in cluster]
        head = contexts[cluster[0]].chunk_text[:80]
        answer.append({"statement": f"Re '{query}': {head}", "sources": srcs})
    return json.dumps({"answer": answer})


SYNTHESIS_PROMPT = (
    "You are a high-trust research synthesis engine. Based ONLY on the "
    "following FACT UNITS, provide a grounded answer.\n"
    "Each fact unit contains multiple supporting sources. Use Source [ID] "
    "for citations.\n"
    "If fact units conflict (e.g. different dates or opposing claims), "
    "YOU MUST mention the conflict.\n"
    "Return your answer ONLY as valid JSON.\n\n"
    "Format:\n"
    "{{\n"
    '  "answer": [\n'
    '    {{"statement": "<claim text here>", "sources": [<source_id1>, '
    "<source_id2>]}}\n"
    "  ]\n"
    "}}\n\n"
    "Context:\n{context}\n\nQuery: {query}"
)  # verbatim prompt parity with gemini_api.cpp:436-447


def synthesis_prompt(query: str, contexts: list["SourceContext"],
                     clusters: list[list[int]]) -> str:
    """The exact model input the reference sends (Y2)."""
    return SYNTHESIS_PROMPT.format(
        context=fact_unit_block(contexts, clusters), query=query
    )


def http_synthesizer(provider):
    """Adapt an HttpChatProvider into the `llm(query, contexts, clusters)`
    seam so Y2 runs against a live endpoint (`gemini_api.cpp:420-476`):
    builds the reference prompt, calls generateContent/chat at
    temperature 0, returns the raw report for parse_claims."""

    def llm(query: str, contexts: list[SourceContext],
            clusters: list[list[int]]) -> str:
        return provider.synthesize_report(
            synthesis_prompt(query, contexts, clusters)
        )

    return llm


@dataclass
class ClaimNode:
    statement: str
    source_indices: list[int]
    confidence: float


def parse_claims(report: str, contexts: list[SourceContext]) -> list[ClaimNode]:
    """Y3 (`gemini_api.cpp:496-565`): 'No grounded answer found' ⇒ empty;
    brace-balance check on the sliced JSON; keep only cited sources that
    exist; confidence = mean finalScore of valid citations, else
    top1·0.5 fallback; empty statements dropped."""
    claims: list[ClaimNode] = []
    if "no grounded answer found" in report.lower():
        return claims
    start, end = report.find("{"), report.rfind("}")
    if start == -1 or end == -1 or end <= start:
        return claims
    js = report[start : end + 1]
    if js.count("{") != js.count("}"):
        return claims
    try:
        doc = json.loads(js)
    except json.JSONDecodeError:
        return claims
    by_index = {c.prompt_index: c for c in contexts}
    for item in doc.get("answer", []):
        stmt = item.get("statement", "")
        valid, total = [], 0.0
        for s in item.get("sources", []) or []:
            if isinstance(s, int) and s in by_index:
                valid.append(s)
                total += by_index[s].final_score
        if valid:
            conf = total / len(valid)
        elif contexts:
            conf = contexts[0].final_score * 0.5
        else:
            conf = 0.0
        if stmt:
            claims.append(ClaimNode(stmt, valid, conf))
    return claims


def synthesize(
    query: str,
    contexts: list[SourceContext],
    llm=stub_synthesizer,
    threshold: float = CLUSTER_THRESHOLD,
) -> list[ClaimNode]:
    """Y1→Y2→Y3 composed (deep-dive core, `mainwindow.cpp:804-824`)."""
    clusters = greedy_cluster([c.embedding for c in contexts], threshold)
    report = llm(query, contexts, clusters)
    return parse_claims(report, contexts)
