"""Local-secrets resolution (reference src/secrets.py:20-30): explicit
path -> LOCAL_SECRETS_FILE env -> default file -> {}; bad JSON -> {};
tokens feed GithubClientConfig so the client is constructible from the
environment alone (retrieval/config.py:10-11)."""

from __future__ import annotations

import json

from github_data_pipeline_spark.sources.secrets import (
    github_config_from_secrets,
    github_tokens,
    indexing_settings_from_secrets,
    load_local_secrets,
)


def _write(tmp_path, payload, name="s.json"):
    p = tmp_path / name
    p.write_text(payload if isinstance(payload, str) else json.dumps(payload))
    return p


def test_explicit_path_wins_over_env(tmp_path, monkeypatch):
    a = _write(tmp_path, {"github_tokens": ["A"]}, "a.json")
    b = _write(tmp_path, {"github_tokens": ["B"]}, "b.json")
    monkeypatch.setenv("LOCAL_SECRETS_FILE", str(b))
    assert load_local_secrets(a) == {"github_tokens": ["A"]}
    assert load_local_secrets() == {"github_tokens": ["B"]}


def test_missing_and_invalid_resolve_to_empty(tmp_path, monkeypatch):
    monkeypatch.setenv("LOCAL_SECRETS_FILE", str(tmp_path / "nope.json"))
    assert load_local_secrets() == {}
    bad = _write(tmp_path, "{not json", "bad.json")
    assert load_local_secrets(bad) == {}
    nondict = _write(tmp_path, [1, 2], "list.json")
    assert load_local_secrets(nondict) == {}


def test_client_constructible_from_environment(tmp_path, monkeypatch):
    p = _write(tmp_path, {"github_tokens": ["t1", "t2"]})
    monkeypatch.setenv("LOCAL_SECRETS_FILE", str(p))
    cfg = github_config_from_secrets()
    assert cfg.tokens == ("t1", "t2")
    # overrides pass through to the dataclass
    cfg2 = github_config_from_secrets(max_retries=2)
    assert (cfg2.tokens, cfg2.max_retries) == (("t1", "t2"), 2)
    # and the client itself comes up with rotation working
    from github_data_pipeline_spark.sources.github_client import GithubClient

    client = GithubClient(transport=lambda m, u, h: None, config=cfg)
    assert client._current_token() == "t1"
    assert client._switch_token() is True
    assert client._current_token() == "t2"


def test_tokens_default_and_malformed(tmp_path):
    assert github_tokens({}) == ()
    assert github_tokens({"github_tokens": "oops"}) == ()


def test_indexing_settings_slice(tmp_path, monkeypatch):
    p = _write(
        tmp_path,
        {
            "elasticsearch": {
                "index_prefix": "dev_",
                "batch_size": "250",
                "url": "http://localhost:9200",
            }
        },
    )
    monkeypatch.setenv("LOCAL_SECRETS_FILE", str(p))
    s = indexing_settings_from_secrets()
    assert s["index_prefix"] == "dev_"
    assert s["batch_size"] == 250
    assert s["connection"] == {"url": "http://localhost:9200"}
    # defaults mirror the reference's hardcoded fallbacks
    d = indexing_settings_from_secrets({})
    assert (d["index_prefix"], d["batch_size"]) == ("", 500)


def test_hardlock_resolution_twin():
    """reference src/indexing/config.py:80-85: hardlocked resolution
    silently ignores caller overrides; unlocked resolution merges them."""
    from github_data_pipeline_spark.sources.secrets import (
        resolve_indexing_settings,
    )

    secrets = {"elasticsearch": {"index_prefix": "locked_", "batch_size": 100}}
    cli = {"index_prefix": "cli_", "batch_size": 9, "connection": {"url": "u"}}
    locked = resolve_indexing_settings(cli, hardlock=True, secrets=secrets)
    assert locked["index_prefix"] == "locked_" and locked["batch_size"] == 100
    open_ = resolve_indexing_settings(cli, hardlock=False, secrets=secrets)
    assert open_["index_prefix"] == "cli_" and open_["batch_size"] == 9
    assert open_["connection"]["url"] == "u"
    # module default is unlocked (the documented intentional divergence)
    dflt = resolve_indexing_settings(cli, secrets=secrets)
    assert dflt["index_prefix"] == "cli_"
