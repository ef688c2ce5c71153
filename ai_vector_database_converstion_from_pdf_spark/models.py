"""M1-M3 — model registry & capability inference (SURVEY §2.7).

Reference: `GeminiApi::discoverModels` (`gemini_api.cpp:664-737`) probes
Ollama `/api/tags` + LM Studio `/v1/models` and infers capabilities from
the model NAME: embed/nomic → Embedding; rerank/bge → Rerank; everything
else → Chat+Summary+Rerank. Triple-engine selection (embed/reason/rerank
slots) persists per workspace (`mainwindow.cpp:350-408`).

Here the registry is a plain config table (a `models` DataFrame when
needed); discovery endpoints are pluggable probes (import/HTTP-gated,
deterministic stub by default). Engine slots persist through the
workspace KV metadata (sinks.Workspace), same keys as the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

CAPABILITIES = ("embedding", "chat", "rerank", "summary")


@dataclass(frozen=True)
class ModelInfo:
    name: str
    engine: str               # gemini | ollama | lmstudio | local-stub
    endpoint: str = ""
    capabilities: tuple[str, ...] = ()
    max_tokens: int = 4096


def infer_capabilities(name: str) -> tuple[str, ...]:
    """Name-based inference, exactly the reference's rule
    (`gemini_api.cpp:692-704`)."""
    n = name.lower()
    if "embed" in n or "nomic" in n:
        return ("embedding",)
    if "rerank" in n or "bge" in n:
        return ("rerank",)
    return ("chat", "summary", "rerank")


def make_model(name: str, engine: str, endpoint: str = "") -> ModelInfo:
    return ModelInfo(name, engine, endpoint, infer_capabilities(name))


@dataclass
class ModelRegistry:
    """Discovery + triple-engine selection (embed/reason/rerank slots)."""

    models: list[ModelInfo] = field(default_factory=list)
    embed_engine: str | None = None
    reason_engine: str | None = None
    rerank_engine: str | None = None

    def discover(self, probes=None) -> "ModelRegistry":
        """probes: callables returning [(name, engine, endpoint)]. The
        default stub registers the deterministic local providers."""
        found = []
        for probe in probes or [default_probe]:
            try:
                found.extend(probe())
            except Exception:
                continue  # unreachable endpoint — reference skips silently
        self.models = [make_model(*f) for f in found]
        return self

    def with_capability(self, cap: str) -> list[ModelInfo]:
        return [m for m in self.models if cap in m.capabilities]

    def select(self, embed: str, reason: str, rerank: str) -> None:
        names = {m.name for m in self.models}
        for n in (embed, reason, rerank):
            if n not in names:
                raise ValueError(f"unknown model {n!r}")
        self.embed_engine, self.reason_engine, self.rerank_engine = embed, reason, rerank

    def persist(self, workspace) -> None:
        """Per-workspace persistence, same keys as `mainwindow.cpp:365-403`."""
        for key, val in (
            ("embed_engine", self.embed_engine),
            ("reason_engine", self.reason_engine),
            ("rerank_engine", self.rerank_engine),
        ):
            if val:
                workspace.set_metadata(key, val)

    @classmethod
    def load(cls, workspace, probes=None) -> "ModelRegistry":
        reg = cls().discover(probes)
        reg.embed_engine = workspace.get_metadata("embed_engine")
        reg.reason_engine = workspace.get_metadata("reason_engine")
        reg.rerank_engine = workspace.get_metadata("rerank_engine")
        return reg


def default_probe() -> list[tuple[str, str, str]]:
    """Deterministic local stub providers (FIXTURES.md §C)."""
    return [
        ("hash-embed-64", "local-stub", ""),
        ("overlap-rerank", "local-stub", ""),
        ("stub-synthesizer-chat", "local-stub", ""),
    ]


def ollama_probe(base: str = "http://127.0.0.1:11434") -> list[tuple[str, str, str]]:
    """Live Ollama discovery (`gemini_api.cpp:667-671`); import/HTTP-gated."""
    import json
    import urllib.request

    with urllib.request.urlopen(f"{base}/api/tags", timeout=2) as r:
        tags = json.load(r)
    return [(m["name"], "ollama", f"{base}/api/generate") for m in tags.get("models", [])]


def gemini_probe(
    base: str = "https://generativelanguage.googleapis.com", api_key: str = ""
) -> list[tuple[str, str, str]]:
    """Live Gemini model discovery (M3 / `list_models.py:6-18`): GET
    /v1beta/models and keep models that can embed or generate. HTTP-gated;
    delegates to functions.providers.gemini_probe for the wire shape."""
    from .functions.providers import gemini_probe as _probe

    return _probe(base, api_key=api_key)
