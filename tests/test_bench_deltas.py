"""Bench regression-detector recovery (r11 verdict #1).

The driver stores only the TAIL of bench stdout in BENCH_r*.json; at
142 queries the per-query map can be front-truncated mid-object, the
tail regex finds nothing, and the detector silently compared ZERO
queries while reporting an empty (vacuous) ``regressed`` map. These
tests pin the recovery ladder in bench._recover_prev: full artifact →
complete tail map → PROGRESS.jsonl ``bench_delta.timings`` fallback
(total-matched entry preferred over merely-latest).
"""

from __future__ import annotations

import json

from bench import _normalize_passes, _recover_prev

_TIMINGS = {"q_alpha": 1.5, "q_beta": 2.25, "q_gamma": 0.75}


def _progress_file(tmp_path, entries):
    p = tmp_path / "PROGRESS.jsonl"
    lines = ['{"event": "note", "msg": "unrelated"}', "not json at all"]
    lines += [json.dumps(e) for e in entries]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_full_artifact_short_circuits(tmp_path):
    prev = {"value": 4.5, "queries": _TIMINGS}
    got = _recover_prev(prev, _progress_file(tmp_path, []))
    assert got["queries"] == _TIMINGS
    assert got["value"] == 4.5
    assert got["source"] == "artifact"


def test_complete_tail_map_parses(tmp_path):
    tail = (
        '{"metric": "total_query_wall_seconds", "value": 4.5, '
        '"queries": ' + json.dumps(_TIMINGS) + ', "sf": 0.1}'
    )
    got = _recover_prev({"tail": tail}, _progress_file(tmp_path, []))
    assert got["queries"] == _TIMINGS
    assert got["source"] == "artifact_tail"


def test_truncated_tail_falls_back_to_progress_total_match(tmp_path):
    """The r11 case: the tail is FRONT-truncated mid-map (no complete
    '"queries": {...}' object survives), but the summary line's value
    does — the fallback must pick the PROGRESS entry whose total
    matches that value, not merely the latest entry."""
    right_run = {
        "event": "bench_delta",
        "total": 227.81,
        "timings": _TIMINGS,
    }
    later_local_run = {
        "event": "bench_delta",
        "total": 150.0,
        "timings": {"q_alpha": 99.0},
    }
    progress = _progress_file(tmp_path, [right_run, later_local_run])
    # front-truncated: starts mid-way through the per-query map, then
    # the complete compact summary line (which has no queries map)
    tail = (
        '": 0.812, "q_gamma": 0.75}, "sf": 0.1}\n'
        '{"metric": "total_query_wall_seconds", "value": 227.81, '
        '"unit": "sec", "n_queries": 142, "sf": 0.1}'
    )
    got = _recover_prev({"tail": tail}, progress)
    assert got["queries"] == _TIMINGS
    assert got["value"] == 227.81
    assert got["source"] == "progress_timings_total_matched"


def test_truncated_tail_without_value_uses_latest_progress(tmp_path):
    latest = {"event": "bench_delta", "total": 150.0, "timings": _TIMINGS}
    progress = _progress_file(
        tmp_path,
        [{"event": "bench_delta", "total": 1.0, "timings": {"old": 1.0}}, latest],
    )
    got = _recover_prev({"tail": '": 0.812}'}, progress)
    assert got["queries"] == _TIMINGS
    assert got["value"] == 150.0
    assert got["source"] == "progress_timings_latest"


def test_rotated_progress_falls_back_to_runs_ledger(tmp_path):
    """The round-12 case: the driver ROTATES PROGRESS.jsonl between
    sessions, so a fresh session finds zero bench_delta entries and
    the detector went vacuous again. The committed BENCH_RUNS.jsonl
    ledger must recover the total-matched map."""
    rotated = tmp_path / "PROGRESS.jsonl"
    rotated.write_text('{"ts": 1.0, "wall_s": 5.0, "round": 12}\n')
    runs = tmp_path / "BENCH_RUNS.jsonl"
    runs.write_text(
        json.dumps({"ts": 1.0, "total": 227.81, "timings": _TIMINGS})
        + "\n"
        + json.dumps({"ts": 2.0, "total": 150.0, "timings": {"q_alpha": 9.0}})
        + "\n"
    )
    tail = (
        '": 0.812, "q_gamma": 0.75}, "sf": 0.1}\n'
        '{"metric": "total_query_wall_seconds", "value": 227.81, '
        '"unit": "sec", "n_queries": 142, "sf": 0.1}'
    )
    got = _recover_prev({"tail": tail}, str(rotated), str(runs))
    assert got["queries"] == _TIMINGS
    assert got["source"] == "bench_runs_total_matched"
    # without a recoverable value the LATEST ledger entry stands in
    got2 = _recover_prev({"tail": '": 0.812}'}, str(rotated), str(runs))
    assert got2["queries"] == {"q_alpha": 9.0}
    assert got2["source"] == "bench_runs_latest"


def test_run_ledger_appends_and_caps(tmp_path):
    from bench import _append_run_ledger

    p = str(tmp_path / "BENCH_RUNS.jsonl")
    for i in range(15):
        _append_run_ledger(p, {"q": float(i)}, float(i), keep=12)
    lines = [json.loads(x) for x in open(p)]
    assert len(lines) == 12
    assert lines[-1]["total"] == 14.0 and lines[0]["total"] == 3.0
    assert lines[-1]["timings"] == {"q": 14.0}


def test_no_recovery_path_reports_empty(tmp_path):
    missing = str(tmp_path / "nope.jsonl")
    got = _recover_prev({"tail": '": 0.812}'}, missing)
    assert "queries" not in got


def test_normalization_picks_least_contended_pass_by_probe():
    """r11 verdict #2's failure case: an idle pass followed by a
    contended pass. The headline normalization must scale by the IDLE
    pass's probe bracket (240, 240 -> factor 1.0), not be dragged by
    the contended pass — and must never pick a pass because its high
    bracket makes its normalized total LOOK small (the circular
    overcorrection: 354 * 240/514 = 165 would beat the honest 216)."""
    # probes: idle before+between (240), contended at the end (788)
    pass_norm, value_norm = _normalize_passes(
        total=216.0,  # min-of-2 ~= the idle pass's values
        pass_totals=[216.0, 354.0],
        pass_probes=[240.0, 240.0, 788.0],
    )
    assert value_norm == 216.0  # idle bracket = factor 1.0, stable
    # telemetry still shows both per-pass figures
    assert pass_norm[0] == 216.0
    assert pass_norm[1] < 216.0  # the would-be overcorrection, visible
    # symmetric case: contention during pass 1, idle pass 2
    _, v2 = _normalize_passes(
        total=216.0,
        pass_totals=[354.0, 216.0],
        pass_probes=[788.0, 240.0, 240.0],
    )
    assert v2 == 216.0
