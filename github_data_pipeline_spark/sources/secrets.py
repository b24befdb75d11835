"""Local-secrets resolution — twin of the reference's ``src/secrets.py``.

Resolution order (reference ``src/secrets.py:20-30``): explicit path
argument → ``LOCAL_SECRETS_FILE`` environment variable → a
``local_secrets.json`` next to the package root → ``{}``.  Any parse
error or non-dict payload also resolves to ``{}`` — ingestion must
degrade to anonymous/offline mode, never crash on bad credentials.

On top of the raw dict this module adds the two consumers the
reference wires up from it:

* ``github_config_from_secrets`` — the ``github_tokens`` list feeding
  the token-rotating client (reference ``src/retrieval/config.py:10-11``),
  so a :class:`~.github_client.GithubClient` is constructible from the
  environment alone;
* ``indexing_settings_from_secrets`` — the ``elasticsearch`` section
  (``index_prefix``, ``batch_size``) feeding the sink knobs
  (reference ``src/indexing/config.py:12-24``).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

from .github_client import GithubClientConfig

DEFAULT_SECRETS_FILENAME = "local_secrets.json"


def _default_secrets_path() -> Path:
    # package root's parent = repo root, mirroring the reference's
    # parents[1]-of-src layout (src/secrets.py:14-16)
    root = Path(__file__).resolve().parents[2]
    return root / DEFAULT_SECRETS_FILENAME


def load_local_secrets(path: str | Path | None = None) -> dict[str, Any]:
    """Load secrets from a JSON file; return ``{}`` when unavailable."""
    candidate = path or os.getenv("LOCAL_SECRETS_FILE") or _default_secrets_path()
    secrets_path = Path(candidate).expanduser()
    if not secrets_path.exists():
        return {}
    try:
        with secrets_path.open("r", encoding="utf-8") as handle:
            data = json.load(handle)
            return data if isinstance(data, dict) else {}
    except Exception:
        return {}


def github_tokens(secrets: dict[str, Any] | None = None) -> tuple[str, ...]:
    """The ``github_tokens`` list (reference retrieval/config.py:11)."""
    if secrets is None:
        secrets = load_local_secrets()
    toks = secrets.get("github_tokens", [])
    if not isinstance(toks, list):
        return ()
    return tuple(str(t) for t in toks)


def github_config_from_secrets(
    secrets: dict[str, Any] | None = None, **overrides: Any
) -> GithubClientConfig:
    """A client config resolvable from the environment alone."""
    return GithubClientConfig(tokens=github_tokens(secrets), **overrides)


def indexing_settings_from_secrets(
    secrets: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """The sink-facing slice of the ``elasticsearch`` section: the
    ``index_prefix`` / ``batch_size`` defaults the reference's indexing
    CLI resolves (src/indexing/config.py:22-24).  Connection fields
    (url/credentials/TLS) stay with whatever real connector is wired
    in production and are passed through untouched."""
    if secrets is None:
        secrets = load_local_secrets()
    es = secrets.get("elasticsearch", {})
    if not isinstance(es, dict):
        es = {}
    # degrade-to-default like the loader itself: a hand-edited secrets
    # file with a null prefix or a non-numeric batch size must fall
    # back, not crash startup or mint a "None" table namespace
    prefix = es.get("index_prefix")
    try:
        batch = int(es.get("batch_size", 500))
    except (TypeError, ValueError):
        batch = 500
    return {
        "index_prefix": str(prefix) if isinstance(prefix, str) else "",
        "batch_size": batch,
        "connection": {
            k: es[k]
            for k in ("url", "username", "password", "api_key", "verify_tls")
            if k in es
        },
    }


HARDLOCK = False  # the reference ships with True; see resolve_indexing_settings


def resolve_indexing_settings(
    overrides: dict[str, Any] | None = None,
    *,
    hardlock: bool | None = None,
    secrets: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Settings-resolution twin of reference ``src/indexing/config.py:80-85``.

    The reference's quirk, reproduced faithfully when asked for: with
    ``hardlock=True`` (its shipped default) every caller-supplied
    override — its CLI arguments — is SILENTLY ignored and the
    secrets-file/hardcoded settings win.  Our default is
    ``hardlock=False`` because the silent ignore is an operational
    foot-gun, not query semantics (README "Intentional non-goals"),
    but the behavior is available and unit-pinned
    (tests/test_secrets.py) so a migrating deployment that relies on
    the lock keeps it by flipping :data:`HARDLOCK`.
    """
    if hardlock is None:
        hardlock = HARDLOCK
    base = indexing_settings_from_secrets(secrets)
    if hardlock or not overrides:
        return base
    out = dict(base, **{k: v for k, v in overrides.items() if k != "connection"})
    if "connection" in overrides:
        out["connection"] = dict(base["connection"], **overrides["connection"])
    return out
