"""GithubClient behavioral contract (reference test_http_client.py
semantics: backoff, token rotation, rate-limit handling, Link-header
pagination with preserved cursors, terminal statuses). Pure-Python —
no Spark, no network, no real sleeping."""

from __future__ import annotations

import pytest

from github_data_pipeline_spark.sources.github_client import (
    GithubClient,
    GithubClientConfig,
    Response,
)


class ScriptedTransport:
    def __init__(self, responses):
        self.responses = list(responses)
        self.calls: list[tuple[str, str, dict]] = []

    def __call__(self, method, url, headers):
        self.calls.append((method, url, dict(headers)))
        item = self.responses.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


def make_client(responses, tokens=("t1",), **cfg_kw):
    t = ScriptedTransport(responses)
    c = GithubClient(
        t,
        GithubClientConfig(tokens=tokens, **cfg_kw),
        sleeper=lambda s: None,
        clock=lambda: 1_000.0,
        rng=lambda: 0.5,  # zero jitter
    )
    return c, t


def ok(body, headers=None):
    return Response(200, headers or {}, body)


def test_success_first_try():
    c, t = make_client([ok({"x": 1})])
    assert c.request("GET", "u").json() == {"x": 1}
    assert t.calls[0][2]["Authorization"] == "token t1"


def test_backoff_on_5xx_then_success():
    c, _ = make_client([Response(500), Response(502), ok([1])])
    assert c.request("GET", "u").status_code == 200
    assert [k for k, _ in c.sleep_log] == ["retry", "retry"]
    assert [b for _, b in c.sleep_log] == [2.0, 4.0]  # base * 2^(n-1)


def test_network_exception_retries_then_raises():
    boom = ConnectionError("down")
    c, _ = make_client([boom] * 6, max_retries=3)
    with pytest.raises(ConnectionError):
        c.request("GET", "u")
    assert len(c.sleep_log) == 3


def test_terminal_statuses_no_retry():
    for code in (400, 404, 410, 422):
        c, t = make_client([Response(code)])
        assert c.request("GET", "u").status_code == code
        assert len(t.calls) == 1 and not c.sleep_log


def test_401_rotates_token_then_succeeds():
    c, t = make_client([Response(401), ok([1])], tokens=("t1", "t2"))
    assert c.request("GET", "u").status_code == 200
    assert t.calls[0][2]["Authorization"] == "token t1"
    assert t.calls[1][2]["Authorization"] == "token t2"


def test_401_single_token_terminal():
    c, t = make_client([Response(401)])
    assert c.request("GET", "u").status_code == 401
    assert len(t.calls) == 1


def test_rate_limit_rotates_before_sleeping():
    rl = Response(403, {"X-RateLimit-Remaining": "0", "X-RateLimit-Reset": "1100"})
    c, t = make_client([rl, ok([1])], tokens=("t1", "t2"))
    assert c.request("GET", "u").status_code == 200
    # rotation, not the hour-long sleep
    assert not any(k == "rate-limit-reset" for k, _ in c.sleep_log)
    assert t.calls[1][2]["Authorization"] == "token t2"


def test_rate_limit_single_token_long_sleeps():
    rl = Response(403, {"X-RateLimit-Remaining": "0"})
    c, _ = make_client([rl, ok([1])], tokens=("t1",))
    assert c.request("GET", "u").status_code == 200
    assert ("rate-limit-reset", 3600.0) in c.sleep_log


def test_rate_limit_wrap_all_tokens_then_sleeps():
    rl = lambda: Response(403, {"X-RateLimit-Remaining": "0"})  # noqa: E731
    c, _ = make_client([rl(), rl(), rl(), ok([1])], tokens=("t1", "t2"))
    assert c.request("GET", "u").status_code == 200
    assert any(k == "rate-limit-reset" for k, _ in c.sleep_log)


def test_403_retry_after_honored_and_capped():
    c, _ = make_client(
        [Response(403, {"Retry-After": "999"}), ok([1])],
        max_wait_on_403=180.0,
    )
    assert c.request("GET", "u").status_code == 200
    assert ("backoff-403", 180.0) in c.sleep_log  # capped


def test_403_reset_epoch_wait():
    c, _ = make_client(
        [Response(403, {"X-RateLimit-Remaining": "5",
                        "X-RateLimit-Reset": "not-a-number"}), ok([1])]
    )
    # not rate-limited (remaining!=0, reset non-numeric) -> plain backoff
    assert c.request("GET", "u").status_code == 200
    assert ("backoff-403", 2.0) in c.sleep_log


# -- pagination (reference test_http_client.py:175-191) ------------------


def test_paged_get_follows_cursor_links_and_stamps_repo():
    page1 = ok(
        [{"id": 1}, {"id": 2}],
        {"Link": '<https://api.x/items?cursor=abc&per_page=100>; rel="next"'},
    )
    page2 = ok([{"id": 3}])
    c, t = make_client([page1, page2])
    rows = c.paged_get("https://api.x/items", "o", "r")
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert all(r["repo_name"] == "o/r" for r in rows)
    # per_page appended to the seed URL; cursor URL preserved verbatim
    assert t.calls[0][1] == "https://api.x/items?per_page=100"
    assert t.calls[1][1] == "https://api.x/items?cursor=abc&per_page=100"


def test_paged_get_respects_existing_per_page():
    c, t = make_client([ok([{"id": 1}])])
    c.paged_get("https://api.x/items?per_page=5", "o", "r")
    assert t.calls[0][1] == "https://api.x/items?per_page=5"


def test_paged_get_max_pages_cap():
    pages = [
        ok([{"id": i}], {"Link": f'<https://api.x/i?page={i + 2}>; rel="next"'})
        for i in range(5)
    ]
    c, t = make_client(pages)
    rows = c.paged_get("https://api.x/i", "o", "r", max_pages=2)
    assert [r["id"] for r in rows] == [0, 1]
    assert len(t.calls) == 2


def test_paged_get_stops_on_error_page():
    c, _ = make_client(
        [ok([{"id": 1}], {"Link": '<https://api.x/i?page=2>; rel="next"'}),
         Response(404)]
    )
    rows = c.paged_get("https://api.x/i", "o", "r")
    assert [r["id"] for r in rows] == [1]


def test_paged_get_stops_on_empty_or_non_list():
    c, _ = make_client([ok([])])
    assert c.paged_get("u", "o", "r") == []
    c2, _ = make_client([ok({"message": "nope"})])
    assert c2.paged_get("u", "o", "r") == []
