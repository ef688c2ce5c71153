"""Opt-in smoke against a REAL local LLM runtime (VERDICT r7 #6).

Every HTTP-provider code path in the suite is verified against the
in-process mock server (tests/test_http_providers.py) because the oracle
path must stay hermetic; these tests prove the dialect code against an
actual runtime when one is available. They are SKIPPED unless
PVDB_LIVE_ENDPOINT is set, so CI/driver runs never touch the network:

    PVDB_LIVE_ENDPOINT=http://127.0.0.1:11434 \
    PVDB_LIVE_STYLE=ollama \
    PVDB_LIVE_EMBED_MODEL=nomic-embed-text \
    PVDB_LIVE_CHAT_MODEL=llama3 \
        python -m pytest tests/test_live_providers.py -v

PVDB_LIVE_STYLE selects the dialect (ollama | openai | gemini); model
env vars default to common Ollama names. Assertions are structural
(dimensions, determinism, non-empty text), never content-exact — real
models are not deterministic across versions.
"""

import os

import pytest

ENDPOINT = os.environ.get("PVDB_LIVE_ENDPOINT", "")
STYLE = os.environ.get("PVDB_LIVE_STYLE", "ollama")
EMBED_MODEL = os.environ.get("PVDB_LIVE_EMBED_MODEL", "nomic-embed-text")
CHAT_MODEL = os.environ.get("PVDB_LIVE_CHAT_MODEL", "llama3")

pytestmark = pytest.mark.skipif(
    not ENDPOINT,
    reason="live-provider smoke: set PVDB_LIVE_ENDPOINT to enable",
)


def test_live_probe_lists_models():
    from ai_vector_database_converstion_from_pdf_spark.functions.providers import (
        gemini_probe,
        lmstudio_probe,
        ollama_probe,
    )

    probe = {
        "ollama": ollama_probe,
        "openai": lmstudio_probe,
        "gemini": gemini_probe,
    }[STYLE]
    found = probe(ENDPOINT)
    assert found, "live endpoint listed no models"
    names = [n for n, _e, _u in found]
    assert all(isinstance(n, str) and n for n in names)


def test_live_embed_batch_shape_and_determinism():
    from ai_vector_database_converstion_from_pdf_spark.functions.providers import (
        HttpEmbedProvider,
    )

    prov = HttpEmbedProvider(ENDPOINT, EMBED_MODEL, style=STYLE)
    texts = ["relational joins combine rows", "an unrelated sentence"]
    a = prov.embed_batch(texts)
    assert len(a) == 2
    dim = len(a[0])
    assert dim >= 8 and len(a[1]) == dim
    # embedding endpoints are deterministic for identical input
    b = prov.embed_batch(texts)
    assert [len(v) for v in b] == [dim, dim]
    assert a[0] == pytest.approx(b[0], rel=1e-5)


def test_live_chat_generates_text():
    from ai_vector_database_converstion_from_pdf_spark.functions.providers import (
        HttpChatProvider,
    )

    prov = HttpChatProvider(ENDPOINT, CHAT_MODEL, style=STYLE)
    out = prov.generate("Reply with the single word: pong", temperature=0.0)
    assert isinstance(out, str) and out.strip()


def test_live_summary_prompt_round_trip():
    """The reference's verbatim summary prompt through the live model —
    proves the I15 connector beyond the mock (structure only)."""
    from ai_vector_database_converstion_from_pdf_spark.functions.providers import (
        HttpChatProvider,
    )

    prov = HttpChatProvider(ENDPOINT, CHAT_MODEL, style=STYLE)
    out = prov.summarize(
        "Relational joins combine rows from two tables by matching key "
        "columns; hash joins build a table on the smaller side."
    )
    assert isinstance(out, str) and len(out.strip()) > 0
