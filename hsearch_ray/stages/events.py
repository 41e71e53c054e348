"""Event-stream operators Ray Data lacks natively: gap-based session
windows and an as-of (most-recent-prior) join.

The reference is a pure batch engine with no window semantics
(SURVEY.md §2.9) — but both operators below are the batch re-expression
of its one ordering idiom: sort, then scan equal-key runs
(gen_kmers_from_suffix_array.cpp:51-65).  The physical plan is the
repo-standard sorted-block scan:

  ONE distributed sort by (user_id, ts, event_id) -> per-block
  vectorized kernel over interior users -> block-edge users spill
  (kind=1) to a tiny worker-side groupby regroup (<= 2 users per block
  boundary, never a driver funnel).

Partitioning assumption (documented per the custom-operator rule): a
user's rows land contiguously in the sorted order, so any user not
touching a block edge is COMPLETE within the block; edge users are
re-grouped by a per-user shuffle whose size is O(blocks), not O(rows).

Timestamps flow as int64 epoch microseconds end-to-end (the sort key
and the output), so results hash-compare exactly against DuckDB
``epoch_us``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

I64 = np.int64

_SESSION_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("session_start_us", pa.int64()),
     ("n_events", pa.int64()), ("sum_value_c", pa.int64())]
)
_ASOF_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("prior_ts_us", pa.int64())]
)


def _cents(v: np.ndarray) -> np.ndarray:
    """floor(x*100 + 0.5) — the driver-contract float->int discipline
    (same IEEE result in numpy and DuckDB)."""
    return np.floor(v * 100.0 + 0.5).astype(I64)


def _session_rows(user: np.ndarray, ts: np.ndarray, vc: np.ndarray,
                  gap_us: int) -> pa.Table:
    """Session aggregate rows for a (user, ts, event_id)-sorted slice of
    COMPLETE users.  One vectorized pass: a session break is a user
    change or a gap > gap_us; per-session reduceat for count/sum."""
    n = user.size
    if n == 0:
        return _SESSION_SCHEMA.empty_table()
    new = np.ones(n, dtype=bool)
    new[1:] = (user[1:] != user[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
    starts = np.nonzero(new)[0]
    return pa.table(
        {
            "user_id": pa.array(user[starts], pa.int64()),
            "session_start_us": pa.array(ts[starts], pa.int64()),
            "n_events": pa.array(
                np.diff(np.append(starts, n)).astype(I64), pa.int64()
            ),
            "sum_value_c": pa.array(np.add.reduceat(vc, starts), pa.int64()),
        }
    )


def _prep_events(batch: pa.Table, left_type: str | None = None,
                 right_type: str | None = None) -> pa.Table:
    """Narrow projection with int64 epoch-us timestamps (the sort key);
    optionally tags left/right row roles for the as-of join."""
    ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
    cols = {
        "user_id": batch["user_id"].cast(pa.int64()),
        "ts_us": ts,
        "event_id": batch["event_id"].cast(pa.int64()),
    }
    if left_type is None:
        cols["value_c"] = pa.array(
            _cents(batch["value"].to_numpy(zero_copy_only=False)), pa.int64()
        )
    else:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        cols["is_left"] = pa.array(et == left_type)
        cols["is_right"] = pa.array(et == right_type)
    return pa.table(cols)


def sessionize(events_ds, gap_sec: int = 3600):
    """events -> one row per (user, session): gap-based session windows.

    A session is a maximal run of a user's events with inter-event gap
    <= gap_sec.  Output: (user_id, session_start_us, n_events,
    sum_value_c) — exactly DuckDB's LAG/SUM-window formulation, so the
    oracle hash-matches."""
    gap_us = int(gap_sec) * 1_000_000
    prepped = events_ds.map_batches(_prep_events, batch_format="pyarrow")

    def _scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        schema = pa.schema(list(_SESSION_SCHEMA) + [("kind", pa.int8())])
        if n == 0:
            return schema.empty_table()
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        vc = batch["value_c"].to_numpy(zero_copy_only=False)
        edge = (user == user[0]) | (user == user[-1])
        interior = _session_rows(user[~edge], ts[~edge], vc[~edge], gap_us)
        spill = np.nonzero(edge)[0]
        # spill rows re-use the schema: (user, raw ts, 1, raw cents)
        return pa.table(
            {
                "user_id": pa.array(
                    np.concatenate([interior["user_id"].to_numpy(), user[spill]]),
                    pa.int64(),
                ),
                "session_start_us": pa.array(
                    np.concatenate(
                        [interior["session_start_us"].to_numpy(), ts[spill]]
                    ),
                    pa.int64(),
                ),
                "n_events": pa.array(
                    np.concatenate(
                        [interior["n_events"].to_numpy(),
                         np.ones(spill.size, I64)]
                    ),
                    pa.int64(),
                ),
                "sum_value_c": pa.array(
                    np.concatenate([interior["sum_value_c"].to_numpy(), vc[spill]]),
                    pa.int64(),
                ),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(interior.num_rows, np.int8),
                         np.ones(spill.size, np.int8)]
                    ),
                    pa.int8(),
                ),
            }
        )

    scanned = (
        prepped.sort(["user_id", "ts_us", "event_id"])
        .map_batches(_scan, batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    interior = scanned.filter(expr="kind == 0").map_batches(
        lambda t: t.drop_columns(["kind"]), batch_format="pyarrow"
    )

    def _regroup(group: pa.Table) -> pa.Table:
        # one edge user's raw rows, re-sorted; sessions complete here
        order = np.lexsort((group["session_start_us"].to_numpy(zero_copy_only=False),))
        user = group["user_id"].to_numpy(zero_copy_only=False)[order]
        ts = group["session_start_us"].to_numpy(zero_copy_only=False)[order]
        vc = group["sum_value_c"].to_numpy(zero_copy_only=False)[order]
        return _session_rows(user, ts, vc, gap_us)

    spill_sessions = (
        scanned.filter(expr="kind == 1")
        .groupby("user_id")
        .map_groups(_regroup, batch_format="pyarrow")
    )
    return interior.union(spill_sessions)


def _asof_rows(user: np.ndarray, ts: np.ndarray, eid: np.ndarray,
               is_left: np.ndarray, is_right: np.ndarray) -> pa.Table:
    """As-of rows for a sorted slice of COMPLETE users: for every left
    row, the max right-row ts STRICTLY before it within the same user.
    Vectorized: global running last-right-index + per-row user-run and
    ts-run starts; validity = the carried index not crossing the user
    boundary; strictness = looking up the carrier at the row BEFORE the
    current (user, ts) run."""
    n = user.size
    if n == 0:
        return _ASOF_SCHEMA.empty_table()
    idx = np.arange(n, dtype=I64)
    new_user = np.ones(n, dtype=bool)
    new_user[1:] = user[1:] != user[:-1]
    # index of the first row of each user's run, forward-filled
    ustart = idx[new_user][np.cumsum(new_user) - 1]
    new_ts = new_user.copy()
    new_ts[1:] |= ts[1:] != ts[:-1]
    tstart = idx[new_ts][np.cumsum(new_ts) - 1]
    carrier = np.maximum.accumulate(np.where(is_right, idx, I64(-1)))
    prev = tstart - 1  # last row strictly before this (user, ts) value
    ok = is_left & (prev >= ustart)
    c = carrier[np.maximum(prev, 0)]
    ok &= c >= ustart  # the carried right-row must be the same user's
    sel = np.nonzero(ok)[0]
    return pa.table(
        {
            "event_id": pa.array(eid[sel], pa.int64()),
            "prior_ts_us": pa.array(ts[c[sel]], pa.int64()),
        }
    )


def asof_prior_event(events_ds, left_type: str = "purchase",
                     right_type: str = "click"):
    """As-of join: every ``left_type`` event matched to the most recent
    STRICTLY-prior ``right_type`` event of the same user (inner —
    unmatched left rows drop).  Output: (event_id, prior_ts_us).
    Equal-ts right rows report the shared ts, so ties hash stably."""
    prepped = events_ds.map_batches(
        _prep_events,
        fn_kwargs={"left_type": left_type, "right_type": right_type},
        batch_format="pyarrow",
    )

    def _scan(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("event_id", pa.int64()), ("prior_ts_us", pa.int64()),
             ("user_id", pa.int64()), ("is_left", pa.bool_()),
             ("is_right", pa.bool_()), ("kind", pa.int8())]
        )
        n = batch.num_rows
        if n == 0:
            return schema.empty_table()
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        il = batch["is_left"].to_numpy(zero_copy_only=False)
        ir = batch["is_right"].to_numpy(zero_copy_only=False)
        edge = (user == user[0]) | (user == user[-1])
        i = ~edge
        interior = _asof_rows(user[i], ts[i], eid[i], il[i], ir[i])
        spill = np.nonzero(edge)[0]
        k = interior.num_rows
        return pa.table(
            {
                "event_id": pa.array(
                    np.concatenate([interior["event_id"].to_numpy(), eid[spill]]),
                    pa.int64(),
                ),
                "prior_ts_us": pa.array(
                    np.concatenate([interior["prior_ts_us"].to_numpy(), ts[spill]]),
                    pa.int64(),
                ),
                "user_id": pa.array(
                    np.concatenate([np.zeros(k, I64), user[spill]]), pa.int64()
                ),
                "is_left": pa.array(
                    np.concatenate([np.zeros(k, bool), il[spill]])
                ),
                "is_right": pa.array(
                    np.concatenate([np.zeros(k, bool), ir[spill]])
                ),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(k, np.int8), np.ones(spill.size, np.int8)]
                    ),
                    pa.int8(),
                ),
            }
        )

    scanned = (
        prepped.sort(["user_id", "ts_us", "event_id"])
        .map_batches(_scan, batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    interior = scanned.filter(expr="kind == 0").map_batches(
        lambda t: pa.table({"event_id": t["event_id"].cast(pa.int64()),
                            "prior_ts_us": t["prior_ts_us"].cast(pa.int64())}),
        batch_format="pyarrow",
    )

    def _regroup(group: pa.Table) -> pa.Table:
        ts = group["prior_ts_us"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        user = group["user_id"].to_numpy(zero_copy_only=False)[order]
        il = group["is_left"].to_numpy(zero_copy_only=False)[order]
        ir = group["is_right"].to_numpy(zero_copy_only=False)[order]
        return _asof_rows(user, ts[order], eid[order], il, ir)

    spill_rows = (
        scanned.filter(expr="kind == 1")
        .groupby("user_id")
        .map_groups(_regroup, batch_format="pyarrow")
    )
    return interior.union(spill_rows)


def _transition_pairs(user: np.ndarray, et: np.ndarray) -> pa.Table:
    """Per-user consecutive (prev, next) event-type pairs for a
    (user, ts, event_id)-sorted slice of COMPLETE users.  One vectorized
    pass: a transition exists wherever two adjacent rows share a user."""
    if user.size < 2:
        return pa.table({"prev_type": pa.array([], pa.string()),
                         "next_type": pa.array([], pa.string())})
    same = user[1:] == user[:-1]
    return pa.table({
        "prev_type": pa.array(et[:-1][same], pa.string()),
        "next_type": pa.array(et[1:][same], pa.string()),
    })


def transition_counts(events_ds):
    """Markov transition matrix of the event stream: how often each
    event_type is followed by each other type within the SAME user's
    timeline — the ordered-lag (LAG ... OVER (PARTITION BY user ORDER BY
    ts)) pattern as a distributed batch operator.

    Physical plan is the module-standard sorted-block scan: one sort by
    (user_id, ts_us, event_id), per-block vectorized adjacent-pair
    extraction with PARTIAL counting (one row per (prev, next) per
    block leaves the scan, not one per transition), block-edge users
    spill raw (O(blocks) rows) to a per-user regroup.  The final
    combine is driver-sized by construction: at most |types|^2 rows.

    Output: (prev_type, next_type, n) — exactly DuckDB's LAG
    formulation, so the oracle hash-matches."""
    import pandas as pd

    from hsearch_ray.stages.agg import grouped_agg

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "event_type": batch["event_type"].cast(pa.string()),
        })

    def _partial_counts(pairs: pa.Table) -> pa.Table:
        df = pairs.to_pandas().groupby(
            ["prev_type", "next_type"], as_index=False, sort=False
        ).size()
        return pa.table({
            "prev_type": pa.array(df["prev_type"], pa.string()),
            "next_type": pa.array(df["next_type"], pa.string()),
            "n": pa.array(df["size"].to_numpy(dtype=I64), pa.int64()),
        })

    _SCAN_SCHEMA = pa.schema(
        [("prev_type", pa.string()), ("next_type", pa.string()),
         ("n", pa.int64()), ("user_id", pa.int64()), ("ts_us", pa.int64()),
         ("event_id", pa.int64()), ("kind", pa.int8())]
    )

    def _scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _SCAN_SCHEMA.empty_table()
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        edge = (user == user[0]) | (user == user[-1])
        # adjacent pairs inside the interior region are complete (the
        # boundary pair always crosses a user change, so none is lost)
        i = ~edge
        part = _partial_counts(_transition_pairs(user[i], et[i]))
        spill = np.nonzero(edge)[0]
        k = part.num_rows
        return pa.table({
            "prev_type": pa.array(
                np.concatenate([part["prev_type"].to_numpy(), et[spill]]),
                pa.string()),
            "next_type": pa.array(
                np.concatenate([part["next_type"].to_numpy(),
                                np.full(spill.size, "", object)]),
                pa.string()),
            "n": pa.array(
                np.concatenate([part["n"].to_numpy(), np.zeros(spill.size, I64)]),
                pa.int64()),
            "user_id": pa.array(
                np.concatenate([np.zeros(k, I64), user[spill]]), pa.int64()),
            "ts_us": pa.array(
                np.concatenate([np.zeros(k, I64), ts[spill]]), pa.int64()),
            "event_id": pa.array(
                np.concatenate([np.zeros(k, I64), eid[spill]]), pa.int64()),
            "kind": pa.array(
                np.concatenate([np.zeros(k, np.int8),
                                np.ones(spill.size, np.int8)]), pa.int8()),
        })

    scanned = (
        events_ds.map_batches(_prep, batch_format="pyarrow")
        .sort(["user_id", "ts_us", "event_id"])
        .map_batches(_scan, batch_size=None, batch_format="pyarrow")
        .materialize()
    )

    def _narrow(t: pa.Table) -> pa.Table:
        return pa.table({"prev_type": t["prev_type"].cast(pa.string()),
                         "next_type": t["next_type"].cast(pa.string()),
                         "n": t["n"].cast(pa.int64())})

    interior = scanned.filter(expr="kind == 0").map_batches(
        _narrow, batch_format="pyarrow")

    def _regroup(group: pa.Table) -> pa.Table:
        # one edge user's raw rows, re-sorted; transitions complete here
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        user = group["user_id"].to_numpy(zero_copy_only=False)[order]
        et = group["prev_type"].to_numpy(zero_copy_only=False)[order]
        return _partial_counts(_transition_pairs(user, et))

    spill_counts = (
        scanned.filter(expr="kind == 1")
        .groupby("user_id")
        .map_groups(_regroup, batch_format="pyarrow")
        .map_batches(_narrow, batch_format="pyarrow")
    )
    out = grouped_agg(interior.union(spill_counts),
                      ["prev_type", "next_type"], {"n": ["sum"]})
    out = out.rename(columns={"n__sum": "n"})
    out["n"] = out["n"].astype("int64")
    return out


def _merge_insertion(ru: np.ndarray, rts: np.ndarray,
                     pu: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Vectorized insertion indices of probe points (pu, pts) into the
    (user, ts)-lex-sorted right arrays, probes landing BEFORE equal
    right rows (i.e. searchsorted side='left' under the two-level key).

    NumPy's searchsorted has no lexicographic comparator, so this uses
    the merge-rank trick: lexsort rights and probes together with a
    tie-break flag that orders probes first; a probe's insertion index
    is then its merged position minus its rank among the probes.
    REQUIRES probes already sorted by (user, ts) — true for slices of a
    (user, ts, event_id)-sorted block."""
    m, k = ru.size, pu.size
    if k == 0:
        return np.empty(0, I64)
    if m == 0:
        return np.zeros(k, I64)
    flag = np.concatenate([np.ones(m, np.int8), np.zeros(k, np.int8)])
    u = np.concatenate([ru, pu])
    t = np.concatenate([rts, pts])
    order = np.lexsort((flag, t, u))
    pos = np.empty(m + k, I64)
    pos[order] = np.arange(m + k, dtype=I64)
    return pos[m:] - np.arange(k, dtype=I64)


def _window_count_rows(user: np.ndarray, ts: np.ndarray, eid: np.ndarray,
                       is_left: np.ndarray, is_right: np.ndarray,
                       window_us: int) -> pa.Table:
    """For every left row of a (user, ts, event_id)-sorted slice of
    COMPLETE users: the count of same-user right rows with
    ts in [left_ts - window_us, left_ts).  Two merge-rank passes."""
    li = np.nonzero(is_left)[0]
    if li.size == 0:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "n_prior": pa.array([], pa.int64())})
    ru = user[is_right]
    rts = ts[is_right]
    lu = user[li]
    lts = ts[li]
    lo = _merge_insertion(ru, rts, lu, lts - window_us)
    hi = _merge_insertion(ru, rts, lu, lts)
    return pa.table({
        "event_id": pa.array(eid[li], pa.int64()),
        "n_prior": pa.array(hi - lo, pa.int64()),
    })


def windowed_prior_count(events_ds, left_type: str = "purchase",
                         right_type: str = "click",
                         window_sec: int = 3600):
    """Band (interval) join: every ``left_type`` event with the COUNT of
    the same user's ``right_type`` events in the preceding
    ``window_sec`` seconds — the time-range self-join (ts in
    [t - w, t)) a feature/attribution pipeline runs, as a distributed
    batch operator (zero rows shipped per matched pair: only counts).

    Physical plan is the module-standard sorted-block scan; the
    per-block kernel is two vectorized merge-rank passes (lexsort-based
    lexicographic searchsorted — see _merge_insertion), block-edge
    users spill raw (O(blocks) rows) to a per-user regroup.
    Output: (event_id, n_prior)."""
    window_us = int(window_sec) * 1_000_000
    prepped = events_ds.map_batches(
        _prep_events,
        fn_kwargs={"left_type": left_type, "right_type": right_type},
        batch_format="pyarrow",
    )

    _SCAN_SCHEMA = pa.schema(
        [("event_id", pa.int64()), ("n_prior", pa.int64()),
         ("user_id", pa.int64()), ("ts_us", pa.int64()),
         ("is_left", pa.bool_()), ("is_right", pa.bool_()),
         ("kind", pa.int8())]
    )

    def _scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _SCAN_SCHEMA.empty_table()
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        il = batch["is_left"].to_numpy(zero_copy_only=False)
        ir = batch["is_right"].to_numpy(zero_copy_only=False)
        edge = (user == user[0]) | (user == user[-1])
        i = ~edge
        interior = _window_count_rows(user[i], ts[i], eid[i], il[i], ir[i],
                                      window_us)
        spill = np.nonzero(edge)[0]
        k = interior.num_rows
        return pa.table({
            "event_id": pa.array(
                np.concatenate([interior["event_id"].to_numpy(), eid[spill]]),
                pa.int64()),
            "n_prior": pa.array(
                np.concatenate([interior["n_prior"].to_numpy(),
                                np.zeros(spill.size, I64)]), pa.int64()),
            "user_id": pa.array(
                np.concatenate([np.zeros(k, I64), user[spill]]), pa.int64()),
            "ts_us": pa.array(
                np.concatenate([np.zeros(k, I64), ts[spill]]), pa.int64()),
            "is_left": pa.array(
                np.concatenate([np.zeros(k, bool), il[spill]])),
            "is_right": pa.array(
                np.concatenate([np.zeros(k, bool), ir[spill]])),
            "kind": pa.array(
                np.concatenate([np.zeros(k, np.int8),
                                np.ones(spill.size, np.int8)]), pa.int8()),
        })

    scanned = (
        prepped.sort(["user_id", "ts_us", "event_id"])
        .map_batches(_scan, batch_size=None, batch_format="pyarrow")
        .materialize()
    )

    def _narrow(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"].cast(pa.int64()),
                         "n_prior": t["n_prior"].cast(pa.int64())})

    interior = scanned.filter(expr="kind == 0").map_batches(
        _narrow, batch_format="pyarrow")

    def _regroup(group: pa.Table) -> pa.Table:
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        user = group["user_id"].to_numpy(zero_copy_only=False)[order]
        il = group["is_left"].to_numpy(zero_copy_only=False)[order]
        ir = group["is_right"].to_numpy(zero_copy_only=False)[order]
        return _window_count_rows(user, ts[order], eid[order], il, ir,
                                  window_us)

    spill_rows = (
        scanned.filter(expr="kind == 1")
        .groupby("user_id")
        .map_groups(_regroup, batch_format="pyarrow")
        .map_batches(_narrow, batch_format="pyarrow")
    )
    return interior.union(spill_rows)


def _first_after(ru: np.ndarray, rts: np.ndarray,
                 pu: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """For each probe (user u, time t): the ts of the user's first
    right row STRICTLY after t, or -1.  Rights sorted by (user, ts);
    probes sorted by user (at most one probe per user).  Strictness via
    probing t+1 on integer timestamps."""
    out = np.full(pu.size, -1, I64)
    if ru.size == 0 or pu.size == 0:
        return out
    ins = _merge_insertion(ru, rts, pu, pts + 1)
    ok = ins < ru.size
    ok[ok] &= ru[ins[ok]] == pu[ok]
    out[ok] = rts[ins[ok]]
    return out


def _funnel_partial(user: np.ndarray, ts: np.ndarray,
                    stage: np.ndarray) -> np.ndarray:
    """(n_users, n_viewed, n_clicked, n_purchased) over a
    (user, ts)-sorted slice of COMPLETE users.  Fully vectorized:
    per-run first-view via masked minimum.reduceat, then two
    first-right-after-t merge-rank passes (click after first view,
    purchase after that click)."""
    if user.size == 0:
        return np.zeros(4, I64)
    new = np.ones(user.size, dtype=bool)
    new[1:] = user[1:] != user[:-1]
    starts = np.nonzero(new)[0]
    run_user = user[starts]
    big = np.iinfo(np.int64).max
    vts = np.where(stage == 0, ts, big)
    fv = np.minimum.reduceat(vts, starts)
    has_v = fv < big
    cu, cts = user[stage == 1], ts[stage == 1]
    fc = _first_after(cu, cts, run_user[has_v], fv[has_v])
    has_c = fc >= 0
    pu_, pts_ = user[stage == 2], ts[stage == 2]
    fp = _first_after(pu_, pts_, run_user[has_v][has_c], fc[has_c])
    return np.array([run_user.size, int(has_v.sum()), int(has_c.sum()),
                     int((fp >= 0).sum())], I64)


def funnel_counts(events_ds, stages=("view", "click", "purchase")):
    """Funnel analysis: how many users performed stage 1, then stage 2
    STRICTLY after their first stage-1 event, then stage 3 strictly
    after that stage-2 event — the sequential-pattern aggregate an
    event-analytics pipeline runs, as one sorted-block scan (per-block
    vectorized kernel + edge-user spill regroup; the combine is ONE
    4-int row per block).  Output: one row
    (n_users, n_viewed, n_clicked, n_purchased)."""
    import pandas as pd

    s1, s2, s3 = stages

    def _prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        stage = np.full(et.size, -1, np.int8)
        stage[et == s1] = 0
        stage[et == s2] = 1
        stage[et == s3] = 2
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "stage": pa.array(stage, pa.int8()),
        })

    _SCAN_SCHEMA = pa.schema(
        [("n_users", pa.int64()), ("n_viewed", pa.int64()),
         ("n_clicked", pa.int64()), ("n_purchased", pa.int64()),
         ("user_id", pa.int64()), ("ts_us", pa.int64()),
         ("stage", pa.int8()), ("kind", pa.int8())]
    )

    def _scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _SCAN_SCHEMA.empty_table()
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        stage = batch["stage"].to_numpy(zero_copy_only=False)
        edge = (user == user[0]) | (user == user[-1])
        i = ~edge
        part = _funnel_partial(user[i], ts[i], stage[i])
        spill = np.nonzero(edge)[0]
        return pa.table({
            "n_users": pa.array(
                np.concatenate([[part[0]], np.zeros(spill.size, I64)]),
                pa.int64()),
            "n_viewed": pa.array(
                np.concatenate([[part[1]], np.zeros(spill.size, I64)]),
                pa.int64()),
            "n_clicked": pa.array(
                np.concatenate([[part[2]], np.zeros(spill.size, I64)]),
                pa.int64()),
            "n_purchased": pa.array(
                np.concatenate([[part[3]], np.zeros(spill.size, I64)]),
                pa.int64()),
            "user_id": pa.array(
                np.concatenate([[0], user[spill]]), pa.int64()),
            "ts_us": pa.array(
                np.concatenate([[0], ts[spill]]), pa.int64()),
            "stage": pa.array(
                np.concatenate([np.zeros(1, np.int8), stage[spill]]),
                pa.int8()),
            "kind": pa.array(
                np.concatenate([np.zeros(1, np.int8),
                                np.ones(spill.size, np.int8)]), pa.int8()),
        })

    scanned = (
        events_ds.map_batches(_prep, batch_format="pyarrow")
        .sort(["user_id", "ts_us", "event_id"])
        .map_batches(_scan, batch_size=None, batch_format="pyarrow")
        .materialize()
    )

    cols = ["n_users", "n_viewed", "n_clicked", "n_purchased"]

    def _narrow(t: pa.Table) -> pa.Table:
        return pa.table({c: t[c].cast(pa.int64()) for c in cols})

    interior = scanned.filter(expr="kind == 0").map_batches(
        _narrow, batch_format="pyarrow")

    def _regroup(group: pa.Table) -> pa.Table:
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        user = group["user_id"].to_numpy(zero_copy_only=False)[order]
        stage = group["stage"].to_numpy(zero_copy_only=False)[order]
        part = _funnel_partial(user, ts[order], stage)
        return pa.table({c: pa.array([part[j]], pa.int64())
                         for j, c in enumerate(cols)})

    spill_rows = (
        scanned.filter(expr="kind == 1")
        .groupby("user_id")
        .map_groups(_regroup, batch_format="pyarrow")
        .map_batches(_narrow, batch_format="pyarrow")
    )
    pdf = interior.union(spill_rows).to_pandas()
    total = {c: 0 for c in cols} if pdf.empty else pdf[cols].sum()
    return pd.DataFrame({c: pd.Series([int(total[c])], dtype="int64")
                         for c in cols})


_RUNNING_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()),
     ("running_cents", pa.int64())]
)


def grouped_running_sum(events_ds):
    """Per-partition running total — the cumulative window function
    ``SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING)`` — as a SEGMENTED distributed prefix scan.

    Physical plan (the ``distributed_exclusive_scan`` discipline with a
    per-user reset): ONE distributed sort by (user_id, ts, event_id) +
    materialize (blocks then cover disjoint, stable key ranges); pass A
    reduces each block to ONE mark row — its first key tuple, its last
    user, and the block-local sums of its first and last users' rows;
    the driver walks the O(blocks) marks in key order carrying at most
    one (user, prefix) pair across each boundary (after the sort, only
    a block's FIRST user can continue from the previous block); pass B
    adds the broadcast per-block offset to the first user's block-local
    cumulative sums.  Only O(blocks) rows ever reach the driver and the
    output is independent of block boundaries, hence identical at any
    parallelism level.  Values flow as integer cents (driver-contract
    float discipline), so the DuckDB window oracle hash-matches.
    """
    import ray

    narrow = (
        events_ds.map_batches(_prep_events, batch_format="pyarrow")
        .sort(["user_id", "ts_us", "event_id"])
        .materialize()
    )

    _MARK_SCHEMA = pa.schema(
        [("user_id", pa.int64()), ("ts_us", pa.int64()),
         ("event_id", pa.int64()), ("last_user", pa.int64()),
         ("first_sum", pa.int64()), ("last_sum", pa.int64())]
    )

    def _mark(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _MARK_SCHEMA.empty_table()
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        vc = batch["value_c"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array([int(user[0])], pa.int64()),
            "ts_us": pa.array([int(batch["ts_us"][0].as_py())], pa.int64()),
            "event_id": pa.array(
                [int(batch["event_id"][0].as_py())], pa.int64()),
            "last_user": pa.array([int(user[-1])], pa.int64()),
            "first_sum": pa.array(
                [int(vc[user == user[0]].sum())], pa.int64()),
            "last_sum": pa.array(
                [int(vc[user == user[-1]].sum())], pa.int64()),
        })

    marks = narrow.map_batches(
        _mark, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if not marks.empty:
        marks = marks.sort_values(
            ["user_id", "ts_us", "event_id"]
        ).reset_index(drop=True)
    offsets: dict[tuple[int, int, int], int] = {}
    carry_user, carry = None, 0
    for fu, fts, feid, lu, fs, ls in marks.itertuples(index=False, name=None):
        off = carry if fu == carry_user else 0
        offsets[(int(fu), int(fts), int(feid))] = off
        # only the last user's prefix can cross the next boundary
        carry_user = int(lu)
        carry = off + int(fs) if fu == lu else int(ls)
    ref = ray.put(offsets)

    def _run(batch: pa.Table, ref=ref) -> pa.Table:
        if batch.num_rows == 0:
            return _RUNNING_SCHEMA.empty_table()
        offs = ray.get(ref)
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        vc = batch["value_c"].to_numpy(zero_copy_only=False).astype(I64)
        base = offs[(int(user[0]), int(ts[0]), int(eid[0]))]
        cum = np.cumsum(vc)
        newseg = np.empty(user.size, dtype=bool)
        newseg[0] = True
        newseg[1:] = user[1:] != user[:-1]
        first_idx = np.flatnonzero(newseg)
        seg_id = np.cumsum(newseg) - 1
        running = cum - (cum - vc)[first_idx][seg_id]
        running[seg_id == 0] += base
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(user, pa.int64()),
            "running_cents": pa.array(running.astype(I64), pa.int64()),
        })

    return narrow.map_batches(_run, batch_format="pyarrow", batch_size=None)


_ROLLING_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()),
     ("w_sum_c", pa.int64()), ("w_n", pa.int64())]
)


def grouped_rolling_window(events_ds, k_prev: int = 3):
    """Bounded moving-window aggregate — ``SUM(value)/COUNT(*) OVER
    (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN k_prev
    PRECEDING AND CURRENT ROW)`` — the third window-frame family next
    to the UNBOUNDED running sum (`grouped_running_sum`) and the
    time-band join (`windowed_prior_count`).

    Same physical plan as the running sum (one distributed sort +
    O(blocks) marks + broadcast pass B), except the scalar boundary
    carry generalizes to a bounded VALUE carry: each block boundary
    hands at most ``k_prev`` trailing values of ONE user (the only
    user that can continue across a sorted-block boundary) to its
    successor, so driver state stays O(blocks x k_prev) no matter how
    many rows a user has.  Values flow as integer cents, so the DuckDB
    ROWS-frame window oracle hash-matches exactly.
    """
    import ray

    k = int(k_prev)
    narrow = (
        events_ds.map_batches(_prep_events, batch_format="pyarrow")
        .sort(["user_id", "ts_us", "event_id"])
        .materialize()
    )

    _MARK_SCHEMA = pa.schema(
        [("user_id", pa.int64()), ("ts_us", pa.int64()),
         ("event_id", pa.int64()), ("last_user", pa.int64()),
         ("lu_tail", pa.list_(pa.int64()))]
    )

    def _mark(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _MARK_SCHEMA.empty_table()
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        vc = batch["value_c"].to_numpy(zero_copy_only=False)
        tail = vc[user == user[-1]][-k:] if k > 0 else vc[:0]
        return pa.table({
            "user_id": pa.array([int(user[0])], pa.int64()),
            "ts_us": pa.array([int(batch["ts_us"][0].as_py())], pa.int64()),
            "event_id": pa.array(
                [int(batch["event_id"][0].as_py())], pa.int64()),
            "last_user": pa.array([int(user[-1])], pa.int64()),
            "lu_tail": pa.array([tail.astype(I64).tolist()],
                                pa.list_(pa.int64())),
        })

    marks = narrow.map_batches(
        _mark, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if not marks.empty:
        marks = marks.sort_values(
            ["user_id", "ts_us", "event_id"]
        ).reset_index(drop=True)
    prefixes: dict[tuple[int, int, int], np.ndarray] = {}
    carry_user, carry = None, np.empty(0, dtype=I64)
    for fu, fts, feid, lu, t in marks.itertuples(index=False, name=None):
        pre = carry if int(fu) == carry_user else np.empty(0, dtype=I64)
        prefixes[(int(fu), int(fts), int(feid))] = pre
        t = np.asarray(t, dtype=I64)
        # lu_tail holds min(k, count) trailing rows of the last user:
        # when it is short, the user's block rows are COMPLETE in it,
        # so prepending the inherited prefix reconstructs the true tail.
        carry = (np.concatenate([pre, t])[-k:] if int(lu) == int(fu)
                 else t)
        carry_user = int(lu)
    ref = ray.put(prefixes)

    def _run(batch: pa.Table, ref=ref) -> pa.Table:
        if batch.num_rows == 0:
            return _ROLLING_SCHEMA.empty_table()
        pres = ray.get(ref)
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        vc = batch["value_c"].to_numpy(zero_copy_only=False).astype(I64)
        pre = pres[(int(user[0]), int(ts[0]), int(eid[0]))]
        p = pre.size
        uu = np.concatenate([np.full(p, user[0], dtype=I64),
                             user.astype(I64)])
        vv = np.concatenate([pre, vc])
        n = uu.size
        newseg = np.empty(n, dtype=bool)
        newseg[0] = True
        newseg[1:] = uu[1:] != uu[:-1]
        first_idx = np.flatnonzero(newseg)
        seg_id = np.cumsum(newseg) - 1
        cum0 = np.concatenate([np.zeros(1, dtype=I64), np.cumsum(vv)])
        i = np.arange(n, dtype=I64)
        lo = np.maximum(first_idx[seg_id], i - k)
        wsum = cum0[i + 1] - cum0[lo]
        wn = i - lo + 1
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(user, pa.int64()),
            "w_sum_c": pa.array(wsum[p:].astype(I64), pa.int64()),
            "w_n": pa.array(wn[p:].astype(I64), pa.int64()),
        })

    return narrow.map_batches(_run, batch_format="pyarrow", batch_size=None)


def throttle_events(events_ds, gap_sec: int = 3600):
    """Stream-throttle dedup (the LAG debounce): keep an event iff the
    previous event of the SAME (user, type) — in (ts, event_id) order —
    is more than ``gap_sec`` older (or absent).  Exactly DuckDB's
    ``lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts,
    event_id)`` formulation.

    Unlike the run-aggregate stages in this module (sessionize etc.,
    whose per-run state forces spilling whole boundary runs), the
    throttle decision depends ONLY on the immediate predecessor row, so
    the spill is EXACTLY TWO ROWS PER BLOCK: the block's first row
    (decision pending — its predecessor may close the previous block)
    and the block's last row (predecessor info for the next block).
    Every other row resolves in-block.  Spill volume is therefore a
    hard O(blocks) — independent of user skew; a heavy-hitter user
    spanning many blocks contributes nothing beyond those two rows per
    block.  The resolve pass sorts the O(2·blocks) spilled rows by the
    same key (reproducing their relative global order, where each
    pending row's true predecessor is adjacent) in one small task.
    Returns a Dataset of kept ``event_id`` rows — at scale it streams
    to a sink."""
    gap_us = I64(gap_sec) * I64(1_000_000)

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"].cast(pa.string()),
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
        })

    def _keep_mask(user, et, ts):
        """kept[i] for rows sorted by (user, et, ts, id): first of its
        (user, type) run, or gap to the predecessor exceeds gap_us."""
        kept = np.ones(user.size, dtype=bool)
        if user.size > 1:
            same = (user[1:] == user[:-1]) & (et[1:] == et[:-1])
            kept[1:] = ~same | (ts[1:] - ts[:-1] > gap_us)
        return kept

    _SCHEMA = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("event_type", pa.string()), ("ts_us", pa.int64()),
         ("kind", pa.int8())]
    )

    def _scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        kept = _keep_mask(user, et, ts)
        # rows 1..n-1: the in-block predecessor IS the global
        # predecessor, so their decision is final here
        keep_i = np.nonzero(kept)[0]
        keep_i = keep_i[keep_i > 0]
        # spill kind bitmask: 1 = decision pending (block's first row),
        # 2 = predecessor info (block's last row); a 1-row block is both
        spill = np.array([0, n - 1], dtype=np.int64)[: 2 if n > 1 else 1]
        kinds = (np.array([1, 2], dtype=np.int8)[: spill.size]
                 if n > 1 else np.array([3], dtype=np.int8))
        return pa.table({
            "event_id": pa.array(
                np.concatenate([eid[keep_i], eid[spill]]), pa.int64()),
            "user_id": pa.array(
                np.concatenate([np.zeros(keep_i.size, I64), user[spill]]),
                pa.int64()),
            "event_type": pa.array(
                np.concatenate([np.full(keep_i.size, "", object), et[spill]]),
                pa.string()),
            "ts_us": pa.array(
                np.concatenate([np.zeros(keep_i.size, I64), ts[spill]]),
                pa.int64()),
            "kind": pa.array(
                np.concatenate([np.zeros(keep_i.size, np.int8), kinds]),
                pa.int8()),
        })

    scanned = (
        events_ds.map_batches(_prep, batch_format="pyarrow")
        .sort(["user_id", "event_type", "ts_us", "event_id"])
        .map_batches(_scan, batch_size=None, batch_format="pyarrow")
        .materialize()
    )

    def _narrow(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"].cast(pa.int64())})

    interior = scanned.filter(expr="kind == 0").map_batches(
        _narrow, batch_format="pyarrow")

    def _resolve(batch: pa.Table) -> pa.Table:
        """One task over the O(2·blocks) spilled rows, sorted back into
        their relative global order: each pending row's true global
        predecessor (the previous block's last row) is adjacent, so the
        same keep mask finalizes it."""
        if batch.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64())})
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, et, user))
        kept = _keep_mask(user[order], et[order], ts[order])
        pending = (kind[order] & 1).astype(bool)
        return pa.table({
            "event_id": pa.array(eid[order][kept & pending], pa.int64())})

    spill_kept = (
        scanned.filter(expr="kind > 0")
        .repartition(1)
        .map_batches(_resolve, batch_size=None, batch_format="pyarrow")
    )
    return interior.union(spill_kept)
