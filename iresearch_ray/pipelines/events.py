"""Temporal event-table operators (task brief: windowed aggregates /
sessionization — operators the reference lacks, expressed Ray-Data-first
per SURVEY §2 custom-operator guidance: map_batches narrow stages + ONE
keyed groupby each).

Input: the ``events`` table (event_id, ts, user_id, event_type, value,
props).  All outputs use epoch-microsecond int64 timestamps so the DuckDB
oracles compare exactly (``epoch_us(ts)``).

Scale notes
-----------
- ``event_type_stats``: classic map-side PARTIAL aggregation — each batch
  collapses to ≤ |event_type| rows before the shuffle, so the exchange
  volume is O(batches × types), never O(rows).  This is the pattern every
  100 TB aggregate should take (SURVEY §4.1: pre-aggregate inside
  map_batches before a groupby).
- ``window_agg``: tumbling windows are assigned narrowly (integer division
  on epoch micros), then the same partial-combine groupby; shuffle volume
  O(batches × windows-touched-per-batch × types).
- ``sessionize``: ONE shuffle keyed by user_id; per-group work is a sorted
  diff + cumsum (vectorized).  Partitioning assumption: one user's events
  fit one group (true at any realistic user cardinality; a pathological
  single-user corpus would need time-sliced salting + session stitching).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from iresearch_ray.pipelines.dataops import bare_schema, round_half_away

US = 1_000_000
SESSION_GAP_US = 30 * 60 * US  # pinned: a >30 min gap starts a new session


def _epoch_us(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # fail fast: a null ts would silently become float64 NaN (breaking
        # the int64 epoch contract, NaN window groups, and merged sessions)
        raise ValueError("events.ts contains nulls — filter them before temporal ops")
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# per-type stats (partial combine → tiny groupby)
# ---------------------------------------------------------------------------


def _partial_type_stats(b: pa.Table) -> pa.Table:
    # count mode="all": n_events must be count(*) like the DuckDB oracle —
    # the default "only_valid" would drop null-value events from the count
    # (and from the avg denominator)
    g = pa.TableGroupBy(b.select(["event_type", "value"]), "event_type").aggregate(
        [("value", "count", pc.CountOptions(mode="all")), ("value", "sum")]
    )
    return pa.table(
        {
            "event_type": g["event_type"],
            "n": g["value_count"].cast(pa.int64()),
            # all-null partials sum to null — pin 0 so finish() never
            # float()s a None (counts track non-null values)
            "sum_value": pc.fill_null(g["value_sum"], 0.0),
        }
    )


def event_type_stats(ds):
    """event_type → (n_events, sum_value, avg_value).  Batch-local partial
    aggregation, then one tiny keyed reduce."""

    def finish(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["n"]).as_py())
        s = float(pc.sum(g["sum_value"]).as_py() or 0.0)
        avg = s / n if n else 0.0
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1),
                "n_events": pa.array([n], pa.int64()),
                "sum_value": pa.array([float(round_half_away(s, 4))], pa.float64()),
                "avg_value": pa.array([float(round_half_away(avg, 4))], pa.float64()),
            }
        )

    return (
        ds.select_columns(["event_type", "value"])
        .map_batches(_partial_type_stats, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# tumbling-window aggregate
# ---------------------------------------------------------------------------


def window_agg(ds, window_secs: int = 600):
    """Tumbling-window (window_start_us, event_type) → (n_events,
    sum_value).  Window assignment is a narrow integer division; the
    groupby input is batch-local partials."""
    w_us = window_secs * US

    ds = ds.select_columns(["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        win = (_epoch_us(b["ts"]) // w_us) * w_us
        t = pa.table(
            {
                "window_start_us": pa.array(win),
                "event_type": b["event_type"],
                "value": b["value"],
            }
        )
        # count(*) semantics (mode="all") to match the oracle on null values
        g = pa.TableGroupBy(t, ["window_start_us", "event_type"]).aggregate(
            [("value", "count", pc.CountOptions(mode="all")), ("value", "sum")]
        )
        return pa.table(
            {
                "window_start_us": g["window_start_us"],
                "event_type": g["event_type"],
                "n": g["value_count"].cast(pa.int64()),
                "sum_value": pc.fill_null(g["value_sum"], 0.0),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["n"]).as_py())
        s = float(pc.sum(g["sum_value"]).as_py() or 0.0)
        return pa.table(
            {
                "window_start_us": g["window_start_us"].slice(0, 1),
                "event_type": g["event_type"].slice(0, 1),
                "n_events": pa.array([n], pa.int64()),
                "sum_value": pa.array([float(round_half_away(s, 4))], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .map_groups(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# semi-structured props extraction
# ---------------------------------------------------------------------------


def props_k_stats(ds, key: str = "k"):
    """Extract integer ``key`` from the JSON ``props`` column with ONE RE2
    kernel per batch (pc.extract_regex — no per-row json.loads) and
    aggregate per event_type with the same partial-combine pattern.
    Rows whose props lack the key are counted separately (n_missing)."""
    import re as _re

    pattern = rf'"{_re.escape(key)}":\s*(?P<v>-?\d+)'

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(pc.fill_null(b["props"], ""), pattern)
        # struct_field propagates the no-match nulls (works on chunked too)
        vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        t = pa.table(
            {
                "event_type": b["event_type"],
                "v": vals,
                "miss": pc.cast(pc.is_null(vals), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, "event_type").aggregate(
            [("v", "count"), ("v", "sum"), ("miss", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": g["v_count"].cast(pa.int64()),
                "sum_v": pc.fill_null(g["v_sum"], 0).cast(pa.int64()),
                "n_missing": g["miss_sum"].cast(pa.int64()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1),
                "n_with_key": pa.array([int(pc.sum(g["n"]).as_py())], pa.int64()),
                "sum_k": pa.array([int(pc.sum(g["sum_v"]).as_py())], pa.int64()),
                "n_missing": pa.array([int(pc.sum(g["n_missing"]).as_py())], pa.int64()),
            }
        )

    return (
        ds.select_columns(["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------


def sessionize(ds, gap_us: int = SESSION_GAP_US):
    """Per-user session split on inter-event gaps > gap_us (pinned 30 min).
    ONE shuffle keyed by user_id; sessions numbered 0.. in (ts, event_id)
    order.  Output per session: user_id, session_id, n_events, start_us,
    end_us, sum_value."""

    def per_user(g: pa.Table) -> pa.Table:
        ts = _epoch_us(g["ts"])
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((eid, ts))
        ts, val = ts[order], val[order]
        brk = np.concatenate(([True], np.diff(ts) > gap_us))
        sid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        n_sessions = starts.size
        counts = np.diff(np.concatenate((starts, [ts.size])))
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "user_id": pa.array(np.full(n_sessions, uid, np.int64)),
                "session_id": pa.array(np.arange(n_sessions, dtype=np.int64)),
                "n_events": pa.array(counts.astype(np.int64)),
                "start_us": pa.array(ts[starts]),
                "end_us": pa.array(ts[np.concatenate((starts[1:] - 1, [ts.size - 1]))]),
                "sum_value": pa.array(
                    round_half_away(np.add.reduceat(val, starts), 4)
                ),
            }
        )

    return (
        # bare_schema: shed the parquet pandas-metadata blob BEFORE the
        # shuffle — an unhashable schema defeats Ray's reduce-side schema
        # dedup (see dataops.bare_schema); zero-copy narrow stage
        ds.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(bare_schema, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# as-of / range joins (per-user co-located merges — SURVEY §2 custom-operator
# path (a): map_batches + groupby().map_groups, no all-pairs work)
# ---------------------------------------------------------------------------
#
# Both ops key ONE shuffle by user_id and do vectorized searchsorted merges
# inside the group, so the exchange volume is O(events) and per-group work is
# O(n log n) — the shape an as-of join must take at 100 TB (a sort-merge
# against a co-partitioned right side; never a broadcast of the full right
# table, never a per-row probe loop).  Partitioning assumption: one user's
# events fit one group (same assumption as sessionize, documented there).


def _per_user_sorted(g: pa.Table, types: tuple[str, str]):
    """Split one user's events into (left, right) by type, each sorted by
    (ts, event_id) — the deterministic tie order both ops and their SQL
    oracles pin."""
    ts = _epoch_us(g["ts"])
    eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    typ = g["event_type"].to_numpy(zero_copy_only=False)
    out = []
    for t in types:
        m = np.flatnonzero(typ == t)
        order = m[np.lexsort((eid[m], ts[m]))]
        out.append((ts[order], eid[order]))
    return out


def asof_join(ds, left_type: str = "click", right_type: str = "view"):
    """For every ``left_type`` event, the most recent ``right_type`` event of
    the same user with right.ts <= left.ts (ties: max ts, then max event_id —
    a pinned total order, so the output is hash-comparable to a window-rank
    SQL oracle).  Unmatched left rows get right columns pinned to -1 (a LEFT
    as-of; -1 instead of null keeps the column int64 through to_pandas on
    BOTH the engine and oracle sides).

    Output: event_id, user_id, ts_us, right_event_id, right_ts_us.
    """

    def per_user(g: pa.Table) -> pa.Table:
        (lts, leid), (rts, reid) = _per_user_sorted(g, (left_type, right_type))
        if lts.size == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "right_event_id": pa.array([], pa.int64()),
                    "right_ts_us": pa.array([], pa.int64()),
                }
            )
        # index of the last right row with ts <= left ts; right is sorted by
        # (ts, event_id) so "last" IS the pinned (max ts, max event_id) winner
        pos = np.searchsorted(rts, lts, side="right") - 1
        matched = pos >= 0
        uid = int(g["user_id"][0].as_py())
        r_eid = np.where(matched, reid[np.maximum(pos, 0)], -1)
        r_ts = np.where(matched, rts[np.maximum(pos, 0)], -1)
        return pa.table(
            {
                "event_id": pa.array(leid),
                "user_id": pa.array(np.full(leid.size, uid, np.int64)),
                "ts_us": pa.array(lts),
                "right_event_id": pa.array(r_eid.astype(np.int64)),
                "right_ts_us": pa.array(r_ts.astype(np.int64)),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts", "event_type"])
        .map_batches(bare_schema, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def range_join_count(
    ds, left_type: str = "click", right_type: str = "view", window_secs: int = 600
):
    """For every ``left_type`` event, the COUNT of same-user ``right_type``
    events in the half-open window (left.ts - window, left.ts] — a range
    join reduced to two searchsorted probes per left row.

    Output: event_id, user_id, ts_us, n_right.
    """
    w_us = window_secs * US

    def per_user(g: pa.Table) -> pa.Table:
        (lts, leid), (rts, _reid) = _per_user_sorted(g, (left_type, right_type))
        uid = int(g["user_id"][0].as_py()) if g.num_rows else 0
        hi = np.searchsorted(rts, lts, side="right")
        lo = np.searchsorted(rts, lts - w_us, side="right")
        return pa.table(
            {
                "event_id": pa.array(leid),
                "user_id": pa.array(np.full(leid.size, uid, np.int64)),
                "ts_us": pa.array(lts),
                "n_right": pa.array((hi - lo).astype(np.int64)),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts", "event_type"])
        .map_batches(bare_schema, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# funnel analysis (ordered first-touch step sequence per user)
# ---------------------------------------------------------------------------


def funnel(ds, steps: tuple[str, ...], user_col: str = "user_id"):
    """First-touch funnel: for each user, step i counts iff an event of
    ``steps[i]`` occurs STRICTLY AFTER the user's counted occurrence of
    step i-1 (the classic product-analytics funnel; ties on ts do not
    advance).  Returns one row per step: (step, event_type, n_users).

    Scale shape: the read is pruned to (user, type, ts) and filtered to
    the step types BEFORE the shuffle, then ONE user-keyed groupby
    co-locates each user's (tiny) step-event history; per-user work is a
    len(steps)-iteration numpy chain.  The per-user results reduce via a
    map-side histogram of ``steps_reached`` — the driver sums len(steps)
    integers, never user rows."""
    import pandas as pd

    step_list = list(steps)
    sset = pa.array(step_list, pa.string())

    def prune(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"], value_set=sset)
        t = b.filter(keep)
        return pa.table({user_col: t[user_col], "event_type": t["event_type"], "ts": t["ts"]})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"].to_numpy()
        et = g["event_type"].to_numpy()
        reached = 0
        cur = None
        for s in step_list:
            mask = et == s if cur is None else (et == s) & (ts > cur)
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                break
            cur = ts[idx[0]]
            reached += 1
        return pd.DataFrame({"steps_reached": [reached]})

    def partial_hist(b: pa.Table) -> pa.Table:
        r = b["steps_reached"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.bincount(r, minlength=len(step_list) + 1)
        return pa.table(
            {
                "step": pa.array(np.arange(len(step_list) + 1)),
                "n": pa.array(h.astype(np.int64)),
            }
        )

    per = ds.map_batches(prune, batch_format="pyarrow").groupby(user_col).map_groups(per_user)
    hist = per.map_batches(partial_hist, batch_format="pyarrow").to_pandas()
    h = hist.groupby("step")["n"].sum()
    # n_users at step i = users with steps_reached >= i (suffix sum)
    total = np.zeros(len(step_list) + 1, dtype=np.int64)
    for s, n in h.items():
        total[int(s)] += int(n)
    suffix = np.cumsum(total[::-1])[::-1]
    return pa.table(
        {
            "step": pa.array(np.arange(1, len(step_list) + 1)),
            "event_type": pa.array(step_list, pa.string()),
            "n_users": pa.array(suffix[1:].astype(np.int64)),
        }
    )


def retention_cohorts(ds, period_secs: int = 604_800, user_col: str = "user_id"):
    """Cohort retention matrix: cohort(user) = the period (floor of epoch
    microseconds / period) of the user's FIRST event; for every (cohort,
    offset) cell, n_users = users from that cohort active (>= 1 event) in
    cohort+offset.  Offset 0 is the cohort size itself.

    Scale shape: the read prunes to (user, ts); each batch distinct-compresses
    to (user, period) rows (map-side combine — at most users x periods rows
    leave the map side, not the event stream); ONE user-keyed groupby
    computes cohort = min(period) and emits the user's distinct offsets; a
    tiny (cohort, offset)-keyed count finishes.  No driver-side user state."""

    period_us = int(period_secs) * 1_000_000

    def prune(b: pa.Table) -> pa.Table:
        per = _epoch_us(b["ts"]) // period_us
        t = pa.table({user_col: b[user_col], "period": pa.array(per.astype(np.int64))})
        return t.group_by([user_col, "period"]).aggregate([])

    def per_user(g: pa.Table) -> pa.Table:
        per = np.unique(g["period"].to_numpy(zero_copy_only=False).astype(np.int64))
        cohort = int(per[0])
        return pa.table(
            {
                "cohort_period": pa.array(np.full(per.size, cohort, dtype=np.int64)),
                "period_offset": pa.array(per - cohort),
            }
        )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_period": b["cohort_period"],
                "period_offset": b["period_offset"],
                "n_users": b["count()"].cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["cohort_period", "period_offset"])
        .count()
        .map_batches(rename, batch_format="pyarrow")
    )
