"""Model-catalog source (S7, reference AIProvider.GetModels,
AIProvider.cs:135-216): per-provider HTTP model listing with regex
allow/deny filtering.

Driver-side by design — the catalog is a handful of rows per provider
(the reference's per-request list); nothing here touches executor-scale
data. The fetched names feed the same DataFrame rlike filter surface as
`suite.reference_surface.q_model_catalog_filter` (P5).

Wire formats (AIProvider.cs:151-166):
  kind="ollama": GET {base}/api/tags   → $.models[*].name
  kind="openai": GET {base}/v1/models  → $.data[*].id, with
                 Authorization: Bearer <key> when an api_key is set.

Filter semantics (AIProvider.cs:214-216, ElementMatchesAnyRegexInList):
a model is kept iff it matches ANY allowlist regex AND NO denylist
regex; a null/empty allowlist matches nothing — i.e. an empty allowlist
admits NOTHING (the reference's `?? false`), a deliberate quirk
preserved here. Kept models are prefixed "{provider_name}:{model}".
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ProviderConfig:
    """One entry of the reference's AiProvidersConfiguration map."""

    name: str
    kind: str  # "ollama" | "openai"
    base_url: str
    api_key: str | None = None
    allowlist: tuple[str, ...] = field(default_factory=tuple)
    denylist: tuple[str, ...] = field(default_factory=tuple)


def _matches_any(element: str, patterns) -> bool:
    """AIProvider.cs:214-216: null/empty pattern list → False."""
    return any(
        p is not None and re.search(p, element) for p in (patterns or ())
    )


def fetch_model_catalog(
    providers,
    transport=None,
    timeout: float = 30.0,
) -> list[str]:
    """Fetch + filter the model catalog across providers, in provider
    order (the reference iterates its configuration map). ``transport``
    is the injectable GET seam for tests: callable
    (url, headers_dict, timeout) → response dict; None → stdlib urllib.
    Unknown kinds raise ValueError (the reference's
    ServerConfigurationException)."""
    transport = transport or _urllib_get_json
    results: list[str] = []
    for p in providers:
        headers: dict[str, str] = {}
        if p.kind == "ollama":
            url = _join(p.base_url, "/api/tags")
        elif p.kind == "openai":
            url = _join(p.base_url, "/v1/models")
            if p.api_key is not None:
                headers["Authorization"] = f"Bearer {p.api_key}"
        else:
            raise ValueError(
                f"Unknown handler {p.kind!r} in provider {p.name!r}"
            )
        resp = transport(url, headers, timeout)
        if p.kind == "ollama":
            names = [m.get("name") for m in resp.get("models", [])]
        else:
            names = [d.get("id") for d in resp.get("data", [])]
        for name in names:
            if name is None:
                continue
            if _matches_any(name, p.allowlist) and not _matches_any(
                name, p.denylist
            ):
                results.append(f"{p.name}:{name}")
    return results


def catalog_df(spark, providers, transport=None, timeout: float = 30.0):
    """The fetched catalog as a one-column DataFrame (`model` STRING),
    composable with the engine's rlike filter surface (P5)."""
    models = fetch_model_catalog(providers, transport, timeout)
    return spark.createDataFrame([(m,) for m in models], "model string")


def _join(base: str, path: str) -> str:
    return base.rstrip("/") + path


def _urllib_get_json(url, headers, timeout):
    import json
    import urllib.request

    req = urllib.request.Request(url, headers=headers, method="GET")
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))
