"""Benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints the
full-precision per-query JSON line followed by a summary line LAST::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
    {"metric": "...", "value": N, "unit": "sec", "queries": {...rounded...},
     "n_queries": K, "sf": ..., ...telemetry...}

The summary line is the one the driver parses into its BENCH artifact.
Since r13 it carries the per-query map too (rounded to 0.01 s): the
driver's PERF per-query comparison had been vacuous for two rounds
(``n_common: 0``) because the artifact keeps only a tail of stdout and
the full map in the FIRST line was front-truncated (r12 verdict #1).
Full-precision per-query numbers live in the first line, in
PROGRESS.jsonl's bench_delta entries, and in the BENCH_RUNS.jsonl
ledger.

Each query is materialized through the no-op sink so the full plan
(including projections) executes without driver-side collect overhead.
Per-query numbers are min-of-2 measured passes; the summary line also
carries ``pass_totals`` and ``spread_pct`` so a contended run (large
spread) is visible in the driver's recorded output.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cpu_probe_ms() -> float:
    """Fixed single-thread CPU workload, wall-clock ms — a machine-speed
    calibration constant. Idle-machine bench totals of near-identical
    builds were observed drifting UNIFORMLY (every query the same
    factor) across 135 -> 107 s in one afternoon with loadavg ~0: the
    host (a VM) runs at a different effective speed hour to hour, which
    neither pass-spread nor loadavg can see. This probe times the same
    pure-Python md5 loop every run, so two BENCH artifacts can be
    compared speed-normalized (the r8 106-vs-123 'irreproducibility'
    was this phenomenon, not a plan change)."""
    import hashlib
    import time as _t

    t0 = _t.perf_counter()
    h = b""
    for i in range(200_000):
        h = hashlib.md5(h + str(i).encode()).digest()
    return round((_t.perf_counter() - t0) * 1000.0, 1)


def _probe_work(n: int) -> None:
    import hashlib

    h = b""
    for i in range(n):
        h = hashlib.md5(h + str(i).encode()).digest()


def _cpu_probe32_ms(nprocs: int = 32) -> float:
    """32-process version of the probe: effective multi-core THROUGHPUT.

    The single-thread probe provably under-measures contention — in the
    r10 three-way comparison the judge's idle replay had the FASTEST
    single-thread probe (118 ms vs 136-204) and the SLOWEST total
    (174 s vs 148-155): a co-tenant stealing cores is invisible to one
    thread. The bench executes on local[32], so the figure that
    predicts its wall-clock is 32-way throughput. On this host's idle
    windows the 32-way probe reads ~2x the single-thread one (32 SMT
    threads over 16 physical cores); contention moves it much further.
    fork-start processes sidestep the GIL (small-buffer md5 holds it,
    so a threaded version would measure nothing)."""
    import multiprocessing as mp
    import time as _t

    t0 = _t.perf_counter()
    with mp.get_context("fork").Pool(nprocs) as pool:
        pool.map(_probe_work, [200_000] * nprocs)
    return round((_t.perf_counter() - t0) * 1000.0, 1)


#: Idle-window calibration constants for THIS build host (measured
#: r11: probe1 118-133 ms across builder/judge idle runs, probe32
#: 236-265 ms at loadavg < 1.5). ``value_normalized`` = total *
#: (probe32_mean / _PROBE32_REF_MS): >1x probe ratio means the run had
#: less effective 32-way throughput than the idle reference, and the
#: normalized figure is the total an idle run would plausibly have
#: produced — making round-over-round comparison mechanical instead of
#: narrative. The raw total stays the headline ``value``; the
#: normalized one is telemetry beside it.
_PROBE32_REF_MS = 240.0


def _drop_leftover_rdd_blocks(spark) -> None:
    """Unpersist every cached/localCheckpoint'd RDD left by the query
    that just finished (non-blocking). Runs AFTER each noop save,
    OUTSIDE the timed region.

    Each bench iteration rebuilds its DataFrame from parquet, so
    blocks pinned by completed queries are dead weight — but the
    ContextCleaner only reclaims them on driver GC, and across 158
    queries x 3 passes they crowd the unified memory region until the
    big string hash-aggregations spill: doc_repetition_gates measured
    5.63 s in the aged full-bench session vs 1.42 s in a fresh session
    on identical code, token_heavy_hitters 4.66 vs 1.68 (r12 session
    3). With this hook the full bench reproduces the fresh-session
    numbers (-15.3 s summed across the registry, biggest single-query
    effects -3.8/-2.6 s), so per-query figures measure the PLANS, not
    the session's leak history. This frees state, never caches it:
    every timed execution still computes from parquet alone."""
    try:
        it = (
            spark.sparkContext._jsc.sc()
            .getPersistentRDDs()
            .values()
            .iterator()
        )
        while it.hasNext():
            it.next().unpersist(False)
    except Exception:
        pass  # measurement hygiene must never fail the bench


def main() -> None:
    # sample BEFORE any Spark work: this is the EXTERNAL-contention
    # indicator. (Sampling after the warm-up pass reads back our own
    # 32-thread load — observed 9.0 on an idle machine.)
    load_start = os.getloadavg()[0]
    cpu_probe_start = _cpu_probe_ms()
    cpu_probe32_start = _cpu_probe32_ms()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_plans()

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not first-touch JIT/IO: touch every table and exercise one
    # agg + one join + one codegen-heavy expression pipeline.
    from github_data_pipeline_spark.sources.tables import (
        TESTDATA_TABLES,
        load_table,
    )

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    # Then run EVERY query once at the smallest scale factor (500-1000
    # rows/table): one uncounted warm-up iteration compiles each plan's
    # whole-stage-codegen, spins up the streaming engine + Python state
    # workers, and JITs the hot expression loops — so the measured sf0.1
    # pass times the plans and the data, not first-touch compilation.
    smallest = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = smallest if os.path.isdir(smallest) else sf_dir
    for q in registry:
        if q.oracle is None:
            continue
        q.builder(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        _drop_leftover_rdd_blocks(spark)
    # ...and ONE untimed full pass at the TARGET sf. The r8 committed
    # bench (105.94 s) did not reproduce on the driver or the judge's
    # idle replays (123.2-123.4 s, two runs within 0.2%): repeated
    # same-session runs had warmed the OS page cache for the sf0.1
    # parquet (the table count() warm-up reads footers, not data
    # pages) and the JIT for the heavy plans, so the builder measured
    # a steady state fresh runs never reach. This pass pays the
    # cold-state cost OUTSIDE the timed passes for every run alike,
    # so builder / driver / judge numbers converge on the same warm
    # steady state (~2 min extra per bench run — honesty over speed).
    for q in registry:
        if q.oracle is None:
            continue
        q.builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        _drop_leftover_rdd_blocks(spark)

    # Headline set = the oracle-checked queries (rows-only entries —
    # iterative k-means, approx sketches — are correctness-exempt
    # demonstrations, not benchmark queries). Two measured passes, min
    # per query (timeit practice): a single pass is hostage to one GC
    # pause or JIT recompile — observed ±25% run-to-run totals; min-of-2
    # reports the plan's steady-state cost.
    timings: dict[str, float] = {}
    pass_totals: list[float] = []
    # Per-pass probe bracketing (r11 verdict #2): a mid-run co-tenant
    # arrival breaks mean-of-endpoints normalization (one measured
    # case: idle 216 s pass + contended 354 s pass normalized to an
    # impossible 95.9 s). Probe 32-way throughput immediately before
    # pass 1 and after EACH pass, normalize each pass by ITS bracket
    # mean, and report the min — stable under one contended pass.
    pass_probes: list[float] = [_cpu_probe32_ms()]
    for _ in range(2):
        pass_total = 0.0
        for q in registry:
            if q.oracle is None:
                continue
            t0 = time.time()
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = round(time.time() - t0, 3)
            _drop_leftover_rdd_blocks(spark)
            pass_total += el
            timings[q.name] = min(el, timings.get(q.name, el))
        pass_totals.append(round(pass_total, 3))
        pass_probes.append(_cpu_probe32_ms())

    total = round(sum(timings.values()), 3)
    pass_normalized, value_normalized = _normalize_passes(
        total, pass_totals, pass_probes
    )
    # Pass-spread telemetry. Even after the untimed warm-up pass, pass 1
    # systematically carries ~15-20% residual JIT/GC asymmetry on an
    # IDLE machine (measured r9: 159.9 vs 134.2 at loadavg 0.0), which
    # min-of-2 absorbs — so spread alone no longer flags contention;
    # read it together with loadavg_start (external load at bench
    # start). Cross-run stability of the min-of-2 headline is the
    # reproducibility signal (two r9 idle runs: 135.4 vs 133.0, 1.8%).
    spread_pct = round(
        100.0 * (max(pass_totals) - min(pass_totals)) / max(min(pass_totals), 1e-9),
        1,
    )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    _record_deltas(timings, total)
    sf_val = float(sf) if sf else sf_dir
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    # Summary LAST: the driver parses this line into its BENCH
    # artifact's ``parsed`` field. It now ALSO carries the per-query
    # map (rounded to 0.01 s) — for two rounds the driver's PERF
    # comparison was vacuous (``n_common: 0``) because the artifact
    # kept only a 2000-char stdout tail and the full-precision map in
    # the first line was front-truncated; putting the map in the
    # parsed line makes the driver's per-query speedup/geomean
    # computation work with zero contract change (r12 verdict #1).
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": {n: round(t, 2) for n, t in timings.items()},
                "n_queries": len(timings),
                "sf": sf_val,
                "pass_totals": pass_totals,
                "spread_pct": spread_pct,
                # environment telemetry: spread_pct cannot see load
                # that is uniform across both passes (the diagnosed r7
                # creep). loadavg_start is sampled BEFORE any Spark
                # work (external contention); loadavg_end includes the
                # bench's own 32-thread load and is only useful
                # relative to other runs' end values.
                "loadavg_start": round(load_start, 2),
                "loadavg_end": round(os.getloadavg()[0], 2),
                # machine-speed calibration (see _cpu_probe_ms): compare
                # totals across runs/rounds NORMALIZED by this probe
                "cpu_probe_ms_start": cpu_probe_start,
                "cpu_probe_ms_end": _cpu_probe_ms(),
                # 32-way throughput probe + the mechanical normalization
                # (see _cpu_probe32_ms / _PROBE32_REF_MS): the
                # single-thread probe cannot see a co-tenant stealing
                # cores; this one can. Probes bracket EACH measured
                # pass (start, between, end); pass_normalized carries
                # each pass scaled by its own bracket mean, and
                # value_normalized scales the min-of-2 headline total
                # by the LEAST-contended pass's bracket — one
                # contended pass cannot drag the figure, where the old
                # mean-of-endpoints overcorrected (r11 verdict #2).
                "cpu_probe32_ms_start": cpu_probe32_start,
                "cpu_probe32_ms_end": pass_probes[-1],
                "cpu_probe32_ms_passes": pass_probes,
                "probe32_ref_ms": _PROBE32_REF_MS,
                "pass_normalized": pass_normalized,
                "value_normalized": value_normalized,
            }
        ),
        flush=True,
    )


def _normalize_passes(
    total: float,
    pass_totals: list[float],
    pass_probes: list[float],
    ref_ms: float = _PROBE32_REF_MS,
) -> tuple[list[float], float]:
    """(pass_normalized, value_normalized) from per-pass probe
    brackets.

    Each pass normalizes by its own bracket mean (telemetry). The
    headline ``value_normalized`` scales the min-of-2 ``total`` by
    the bracket mean of the LEAST-contended pass — chosen by the
    PROBES (the physical measurement), never by the normalized
    outcome: picking the lowest normalized total is circular (a pass
    bracketed by a high probe always "normalizes well", which is
    exactly the mid-run-contention overcorrection r11 flagged in the
    old mean-of-endpoints form). Under one contended pass the
    per-query minima come from the idle pass, so its bracket is the
    machine speed that actually produced them.
    """
    pass_normalized = [
        round(
            pt
            * ref_ms
            / max((pass_probes[i] + pass_probes[i + 1]) / 2.0, 1e-9),
            1,
        )
        for i, pt in enumerate(pass_totals)
    ]
    best = min(
        range(len(pass_totals)),
        key=lambda i: pass_probes[i] + pass_probes[i + 1],
    )
    best_bracket = (pass_probes[best] + pass_probes[best + 1]) / 2.0
    return pass_normalized, round(
        total * ref_ms / max(best_bracket, 1e-9), 1
    )


def _recover_prev(
    prev: dict, progress_path: str, runs_path: str | None = None
) -> dict:
    """Recover ``{"value", "queries", "source"}`` from a BENCH artifact.

    The driver stores only the bench stdout's TAIL as a string, and at
    142 queries the per-query map can be FRONT-truncated mid-object —
    in round 11 the tail regex found nothing, ``prev_q`` was empty,
    and the regression detector silently compared ZERO queries while
    reporting ``"regressed": {}`` (r11 verdict #1). Recovery order:

    1. a full ``queries`` map in the artifact itself;
    2. a complete ``"queries": {...}`` object inside the tail string;
    3. PROGRESS.jsonl's ``bench_delta.timings``, then the COMMITTED
       ``BENCH_RUNS.jsonl`` ledger — PROGRESS.jsonl is driver-managed
       and ROTATED between sessions (observed in round 12: a fresh
       session found zero bench_delta entries and the detector went
       vacuous again), so every bench run also appends its full map
       to the git-tracked ledger. When the artifact's total is
       recoverable, the entry whose ``total`` matches it identifies
       the exact run that produced the artifact; otherwise the most
       recent entry stands in (source says so).
    """
    import re

    out: dict = {"source": "artifact"}
    if "queries" in prev:
        out.update(value=prev.get("value"), queries=prev["queries"])
        return out
    tail = prev.get("tail", "")
    m = re.search(r'"value": ([0-9.]+)', tail)
    if m:
        out["value"] = float(m.group(1))
    mq = re.search(r'"queries": (\{[^}]*\})', tail)
    if mq:
        out["queries"] = json.loads(mq.group(1))
        out["source"] = "artifact_tail"
        return out
    entries: list[tuple[str, dict]] = []
    for path, origin in (
        (progress_path, "progress_timings"),
        (runs_path, "bench_runs"),
    ):
        if not path:
            continue
        try:
            with open(path) as f:
                for line in f:
                    try:
                        e = json.loads(line)
                    except ValueError:
                        continue
                    if (
                        origin == "progress_timings"
                        and e.get("event") != "bench_delta"
                    ):
                        continue
                    if e.get("timings"):
                        entries.append((origin, e))
        except OSError:
            continue
    # merge the two sources by timestamp, not by source order: if one
    # ledger append failed, an older bench_runs entry must not shadow a
    # newer progress_timings entry as the presumed previous run.
    # Entries without a ts (pre-r13 bench_delta lines) sort oldest.
    entries.sort(key=lambda oe: oe[1].get("ts", 0.0))
    want = out.get("value")
    for origin, e in reversed(entries):
        if want is not None and abs(e.get("total", -1) - want) < 0.01:
            out["queries"] = e["timings"]
            out["source"] = f"{origin}_total_matched"
            return out
    if entries:
        origin, e = entries[-1]
        out["queries"] = e["timings"]
        out.setdefault("value", e.get("total"))
        out["source"] = f"{origin}_latest"
    return out


def _record_deltas(timings: dict[str, float], total: float) -> None:
    """Append a per-query comparison vs the latest BENCH_r*.json to
    PROGRESS.jsonl so regressions are mechanically visible next round.
    Never interferes with the stdout contract (single JSON line)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    benches = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    runs_path = os.path.join(here, "BENCH_RUNS.jsonl")
    if not benches:
        _append_run_ledger(runs_path, timings, total)
        return
    try:
        with open(benches[-1]) as f:
            prev = json.load(f)
        prev = _recover_prev(
            prev, os.path.join(here, "PROGRESS.jsonl"), runs_path
        )
        prev_q = prev.get("queries", {})
        deltas = {
            name: round(t - prev_q[name], 3)
            for name, t in timings.items()
            if name in prev_q
        }
        regressed = {
            n: d for n, d in deltas.items() if d > max(0.5, 0.5 * prev_q[n])
        }
        entry = {
            "event": "bench_delta",
            "ts": round(time.time(), 1),
            "vs": os.path.basename(benches[-1]),
            # where the previous per-query map came from — a vacuous
            # comparison (0 compared queries) is now impossible to
            # mistake for "0 regressions"
            "prev_source": prev.get("source"),
            "compared_queries": len(deltas),
            "total": total,
            "prev_total": prev.get("value"),
            "new_queries": sorted(set(timings) - set(prev_q)),
            "removed_queries": sorted(set(prev_q) - set(timings)),
            "regressed": regressed,
            "deltas": deltas,
            # full map too: the driver artifact stores only a tail
            # buffer, so this line is the durable per-query record
            "timings": timings,
        }
        with open(os.path.join(here, "PROGRESS.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
    except Exception:
        pass  # best-effort diagnostics must never fail the bench
    _append_run_ledger(runs_path, timings, total)


def _append_run_ledger(
    runs_path: str, timings: dict[str, float], total: float, keep: int = 12
) -> None:
    """Append this run's full per-query map to the committed
    BENCH_RUNS.jsonl ledger (kept to the last ``keep`` runs).

    PROGRESS.jsonl is driver-managed and rotated between sessions, so
    it cannot be the only durable copy of the per-query map — this
    ledger is git-tracked and survives rotation, making the regression
    detector's recovery ladder work across rounds. Appended AFTER the
    delta comparison so a run never total-matches itself."""
    try:
        lines: list[str] = []
        try:
            with open(runs_path) as f:
                lines = [ln for ln in f.read().splitlines() if ln.strip()]
        except OSError:
            pass
        lines.append(
            json.dumps(
                {"ts": round(time.time(), 1), "total": total, "timings": timings}
            )
        )
        # atomic replace: a crash mid-write must not truncate the ledger
        # history the recovery ladder depends on
        tmp_path = f"{runs_path}.tmp.{os.getpid()}"
        with open(tmp_path, "w") as f:
            f.write("\n".join(lines[-keep:]) + "\n")
        os.replace(tmp_path, runs_path)
    except Exception:
        pass  # best-effort diagnostics must never fail the bench


if __name__ == "__main__":
    main()
