"""Session windows + as-of join: the sorted-block kernels must agree
with a trivial driver-side reference even when users span many tiny
blocks (the boundary-spill path)."""

import numpy as np
import pyarrow as pa
import pytest


def _events(n_users=12, n_events=600, seed=4):
    rng = np.random.Generator(np.random.PCG64(seed))
    user = rng.integers(1, n_users + 1, size=n_events).astype(np.int64)
    # bursty timestamps: clusters of activity with long gaps between
    ts = np.cumsum(rng.choice([1, 5, 30, 7200], size=n_events,
                              p=[0.5, 0.3, 0.1, 0.1])) * 1_000_000
    ts = ts + rng.integers(0, 1000, size=n_events)
    types = rng.choice(["click", "purchase", "view"], size=n_events,
                       p=[0.5, 0.2, 0.3])
    value = np.round(rng.uniform(0, 100, size=n_events), 2)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(types.tolist(), pa.string()),
            "value": pa.array(value, pa.float64()),
        }
    )


def _many_blocks(tbl, n=23):
    import ray.data

    step = max(1, tbl.num_rows // n)
    return ray.data.from_arrow(
        [tbl.slice(i, step) for i in range(0, tbl.num_rows, step)]
    )


def _ref_sessions(tbl, gap_us):
    import pandas as pd

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    df["vc"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    out = []
    for uid, g in df.groupby("user_id"):
        t = g["ts_us"].to_numpy()
        new = np.ones(t.size, bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new)
        for s in np.unique(sid):
            m = sid == s
            out.append((int(uid), int(t[m].min()), int(m.sum()),
                        int(g["vc"].to_numpy()[m].sum())))
    return set(out)


def test_sessionize_matches_reference_across_blocks(ray_session):
    from hsearch_ray.stages.events import sessionize

    tbl = _events()
    want = _ref_sessions(tbl, 3600 * 1_000_000)
    got = sessionize(_many_blocks(tbl), gap_sec=3600).to_pandas()
    got_set = set(zip(got["user_id"], got["session_start_us"],
                      got["n_events"], got["sum_value_c"]))
    assert got_set == want
    assert len(want) > 20  # fixture really has multiple sessions


def _ref_asof(tbl):
    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    out = {}
    for _, row in df[df["event_type"] == "purchase"].iterrows():
        c = df[(df["user_id"] == row["user_id"])
               & (df["event_type"] == "click")
               & (df["ts_us"] < row["ts_us"])]
        if len(c):
            out[int(row["event_id"])] = int(c["ts_us"].max())
    return out


def test_asof_join_matches_reference_across_blocks(ray_session):
    from hsearch_ray.stages.events import asof_prior_event

    tbl = _events(seed=9)
    want = _ref_asof(tbl)
    got = asof_prior_event(_many_blocks(tbl)).to_pandas()
    got_map = dict(zip(got["event_id"].astype(int),
                       got["prior_ts_us"].astype(int)))
    assert got_map == want
    assert len(want) > 30


def test_asof_strictly_prior_and_ties(ray_session):
    """A click at EXACTLY the purchase's timestamp must not match
    (strictly prior); an earlier click must."""
    import ray.data

    from hsearch_ray.stages.events import asof_prior_event

    t0 = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([t0, t0 + 5, t0 + 5, t0 + 9], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(
                ["click", "click", "purchase", "purchase"], pa.string()
            ),
            "value": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
        }
    )
    got = asof_prior_event(ray.data.from_arrow(tbl)).to_pandas()
    m = dict(zip(got["event_id"].astype(int), got["prior_ts_us"].astype(int)))
    # purchase@t0+5: only the click at t0 is strictly prior
    # purchase@t0+9: the click at t0+5 wins
    assert m == {3: t0, 4: t0 + 5}


def test_streaming_sessionize_equals_batch_under_stress(ray_session):
    """The micro-batch sessionizer must equal the batch operator when
    sessions span MANY micro-batches (batch size 64 << session length),
    ties split across batches, and state shards vary — and the
    watermark close must actually fire (state stays bounded)."""
    import numpy as np
    import pandas as pd
    import ray

    from hsearch_ray.stages.events import sessionize
    from hsearch_ray.stages.streaming import stream_sessionize

    rng = np.random.default_rng(23)
    n, users = 5000, 25
    # bursty timeline: long in-session runs + occasional > gap jumps
    gaps = np.where(rng.random(n) < 0.01,
                    4000 + rng.integers(0, 4000, n),  # session break
                    rng.integers(0, 30, n))           # in-session
    secs = np.cumsum(gaps)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": pd.to_datetime(secs, unit="s").astype("datetime64[us]"),
        "value": rng.random(n) * 100,
    })
    ds = ray.data.from_pandas(df).repartition(8)
    want = sessionize(ds, gap_sec=3600).to_pandas().sort_values(
        ["user_id", "session_start_us"]).reset_index(drop=True)
    for n_shards, mb in ((1, 64), (5, 97)):
        got = stream_sessionize(ray.data.from_pandas(df), gap_sec=3600,
                                n_shards=n_shards, micro_batch_rows=mb)
        got = got.sort_values(["user_id", "session_start_us"]).reset_index(
            drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_new_event_operators_handle_empty_input(ray_session):
    """Every new event operator must return a well-formed empty (or
    zero) result on an empty event stream — not crash in a kernel that
    assumed rows exist."""
    import pandas as pd
    import ray

    from hsearch_ray.stages.events import (funnel_counts, transition_counts,
                                           windowed_prior_count)
    from hsearch_ray.stages.streaming import stream_sessionize

    empty = pd.DataFrame({
        "event_id": pd.Series(dtype="int64"),
        "user_id": pd.Series(dtype="int64"),
        "ts": pd.Series(dtype="datetime64[us]"),
        "event_type": pd.Series(dtype="object"),
        "value": pd.Series(dtype="float64"),
    })
    ds = ray.data.from_pandas(empty)
    t = transition_counts(ds)
    assert len(t) == 0
    w = windowed_prior_count(ds).to_pandas()
    assert len(w) == 0
    f = funnel_counts(ds)
    assert f.iloc[0].tolist() == [0, 0, 0, 0]
    s = stream_sessionize(ds)
    assert len(s) == 0


def _ref_running(tbl):
    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    df["vc"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    run = df.groupby("user_id")["vc"].cumsum()
    return dict(zip(df["event_id"].astype(int), run.astype(int)))


def test_grouped_running_sum_matches_reference_across_blocks(ray_session):
    """The segmented prefix scan must be independent of block layout —
    the 23-tiny-block run forces users to span many block boundaries
    (the driver carry walk) and must equal the single-block run and the
    pandas groupby-cumsum truth."""
    import ray.data

    from hsearch_ray.stages.events import grouped_running_sum

    tbl = _events(n_users=7, n_events=600, seed=11)
    want = _ref_running(tbl)
    for ds in (ray.data.from_arrow(tbl), _many_blocks(tbl)):
        got = grouped_running_sum(ds).to_pandas()
        got_map = dict(zip(got["event_id"].astype(int),
                           got["running_cents"].astype(int)))
        assert got_map == want
    # the fixture genuinely accumulates (not all singleton users)
    assert max(want.values()) > 10 * min(want.values())


def test_grouped_running_sum_single_user_spans_all_blocks(ray_session):
    """Adversarial carry: ONE user across every block — every block
    boundary must chain the carry (offset = prefix of all prior
    blocks)."""
    from hsearch_ray.stages.events import grouped_running_sum

    n = 200
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 1_000_000,
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(np.full(n, 42, np.int64)),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.full(n, 1.0), pa.float64()),
    })
    got = grouped_running_sum(_many_blocks(tbl, n=20)).to_pandas()
    got = got.sort_values("event_id")
    assert (got["running_cents"].to_numpy()
            == 100 * np.arange(1, n + 1)).all()


def test_grouped_running_sum_empty_input(ray_session):
    import ray.data

    from hsearch_ray.stages.events import grouped_running_sum

    empty = _events().slice(0, 0)
    out = grouped_running_sum(ray.data.from_arrow(empty)).to_pandas()
    assert len(out) == 0


def _ref_rolling(tbl, k=3):
    import pandas as pd

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    df["vc"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    g = df.groupby("user_id")["vc"]
    ws = g.rolling(k + 1, min_periods=1).sum().reset_index(level=0, drop=True)
    wn = g.rolling(k + 1, min_periods=1).count().reset_index(
        level=0, drop=True)
    return {int(e): (int(s), int(n)) for e, s, n in
            zip(df["event_id"], ws, wn)}


def test_grouped_rolling_window_matches_reference_across_blocks(ray_session):
    """The bounded-frame window must be independent of block layout:
    the 23-tiny-block run forces the k-value carry across many
    boundaries and must equal the single-block run and the pandas
    rolling truth."""
    import ray.data

    from hsearch_ray.stages.events import grouped_rolling_window

    tbl = _events(n_users=7, n_events=600, seed=17)
    want = _ref_rolling(tbl, k=3)
    for ds in (ray.data.from_arrow(tbl), _many_blocks(tbl)):
        got = grouped_rolling_window(ds, k_prev=3).to_pandas()
        got_map = {int(e): (int(s), int(n)) for e, s, n in
                   zip(got["event_id"], got["w_sum_c"], got["w_n"])}
        assert got_map == want
    # the frame genuinely saturates (some windows hold k+1 rows)
    assert max(n for _, n in want.values()) == 4


def test_grouped_rolling_window_carry_chains_across_tiny_blocks(ray_session):
    """Adversarial: ONE user, 2 rows per block, window of 5 previous —
    every window spans >= 2 block boundaries, so a carry that only
    looks one block back would under-fill the frame."""
    from hsearch_ray.stages.events import grouped_rolling_window

    n = 40
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 1_000_000,
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(np.full(n, 7, np.int64)),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.arange(1, n + 1, dtype=np.float64)),
    })
    got = grouped_rolling_window(_many_blocks(tbl, n=20),
                                 k_prev=5).to_pandas()
    got = got.sort_values("event_id")
    i = np.arange(n)
    lo = np.maximum(0, i - 5)
    v = 100 * np.arange(1, n + 1, dtype=np.int64)
    cum0 = np.concatenate([[0], np.cumsum(v)])
    assert (got["w_sum_c"].to_numpy() == cum0[i + 1] - cum0[lo]).all()
    assert (got["w_n"].to_numpy() == i - lo + 1).all()


def test_grouped_rolling_window_empty_input(ray_session):
    import ray.data

    from hsearch_ray.stages.events import grouped_rolling_window

    empty = _events().slice(0, 0)
    out = grouped_rolling_window(ray.data.from_arrow(empty)).to_pandas()
    assert len(out) == 0
