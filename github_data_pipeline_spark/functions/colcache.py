"""Memoized deterministic Column fragments (plan-construction cache).

Building a large Catalyst expression through the Column API costs one
py4j round trip per operator node — the ~1k-node Porter stemmer alone
is ~10,000 round trips (~2 s of driver wall-clock), paid again on
every builder call even though the resulting tree is a deterministic
function of its string inputs (r12 builder profile: 114 s of the
158-query bench total was Python-side plan construction; guide §5.3 —
driver-side latency). Column objects are immutable, unresolved
expression trees: the same fragment can be attached to any number of
plans, and name resolution happens per-plan at analysis time, so
reuse is semantically identical to rebuilding.

The cache stores COLUMN TREES only — plan text, never data, results,
or anything derived from an input table — so every query execution
still computes from its parquet inputs alone. Keys must capture every
input that shapes the tree (column names, mode flags, literal
parameters); only call sites whose inputs are plain strings/constants
opt in.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}


def memo_col(key: tuple, build: Callable[[], Any]) -> Any:
    """Return the memoized Column (or list of Columns — any immutable
    plan fragment) for ``key``, building it on miss."""
    col = _CACHE.get(key)
    if col is None:
        col = _CACHE[key] = build()
    return col


_KEYABLE = (str, int, float, bool, type(None))


def memoize_when_keyable(fn):
    """Decorator: memoize the Column result when every positional
    argument is a plain hashable builder input (str column name, int
    parameter, ...). Calls that pass Column objects build normally —
    a Column's identity cannot key a cache safely."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args):
        if all(isinstance(a, _KEYABLE) for a in args):
            return memo_col(
                (fn.__module__, fn.__qualname__, args), lambda: fn(*args)
            )
        return fn(*args)

    return wrapper


def cache_info() -> tuple[int, ...]:  # pragma: no cover - debug aid
    return (len(_CACHE),)
