"""events_funnel greedy-chain semantics on a hand-built stream."""

import pandas as pd
import ray
import ray.data


def test_funnel_greedy_chain(ray_session, tmp_path):
    from cosmwasm_etl_ray.pipelines.queries_extra import events_funnel

    t0 = pd.Timestamp("2026-01-01")

    def ev(user, typ, minutes):
        return {"user_id": user, "event_type": typ, "ts": t0 + pd.Timedelta(minutes=minutes)}

    rows = [
        # user 1: full chain in order -> stage 3, greedy first times
        ev(1, "view", 0), ev(1, "view", 5), ev(1, "click", 10),
        ev(1, "purchase", 20), ev(1, "click", 15),
        # user 2: purchase precedes the first valid click -> the
        # purchase is NOT consumable (strictly-after), stage 2
        ev(2, "view", 0), ev(2, "purchase", 5), ev(2, "click", 10),
        # user 3: click before view (doesn't count), none after -> stage 1
        ev(3, "click", 0), ev(3, "view", 5),
        # user 4: no view at all -> stage 0, all NaT
        ev(4, "click", 0), ev(4, "purchase", 5),
        # user 5: click at the SAME ts as view is NOT strictly after
        ev(5, "view", 0), ev(5, "click", 0),
    ]
    df = pd.DataFrame(rows)
    df["user_id"] = df["user_id"].astype("int64")
    path = tmp_path / "events.parquet"
    df.to_parquet(path)
    # events_funnel reads {sf_dir}/events.parquet
    out = (
        events_funnel(str(tmp_path))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(out["stage"]) == [3, 2, 1, 0, 1]
    assert out.loc[1, "t_view"] == t0
    assert out.loc[1, "t_click"] == t0 + pd.Timedelta(minutes=10)
    assert out.loc[1, "t_purchase"] == t0 + pd.Timedelta(minutes=20)
    assert out.loc[2, "t_click"] == t0 + pd.Timedelta(minutes=10)
    assert pd.isna(out.loc[2, "t_purchase"])
    assert pd.isna(out.loc[4, "t_view"])
    assert pd.isna(out.loc[5, "t_click"])  # same-ts click excluded


def test_retention_cohorts(ray_session, tmp_path):
    """Hand case: distinct-per-week collapse, cohort pinned at the
    user's first week, offsets counted once per user-week."""
    from cosmwasm_etl_ray.pipelines.queries_extra import events_retention

    t0 = pd.Timestamp("1970-01-01")  # week 0 starts here (days // 7)

    def ev(user, days):
        return {"user_id": user, "event_type": "view",
                "ts": t0 + pd.Timedelta(days=days)}

    rows = [
        # user 1: weeks 0, 0 (dup within week), 2
        ev(1, 0), ev(1, 3), ev(1, 14),
        # user 2: weeks 1, 2
        ev(2, 7), ev(2, 15),
        # user 3: week 0 only
        ev(3, 1),
    ]
    df = pd.DataFrame(rows)
    df["user_id"] = df["user_id"].astype("int64")
    df.to_parquet(tmp_path / "events.parquet")
    out = (
        events_retention(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_week", "offset_week"])
        .reset_index(drop=True)
    )
    got = {(r.cohort_week, r.offset_week): r.n_users for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1, (1, 1): 1}


# ------------------------------------------------ property: brute-force parity

from hypothesis import given, settings, strategies as st  # noqa: E402


def _ev_stream():
    return st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),            # user
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(min_value=0, max_value=40),           # minute
        ),
        min_size=0,
        max_size=40,
    )


@settings(max_examples=200, deadline=None)
@given(_ev_stream())
def test_funnel_shard_matches_bruteforce(evs):
    from cosmwasm_etl_ray.pipelines.queries_extra import funnel_shard

    t0 = pd.Timestamp("2026-01-01")
    g = pd.DataFrame(
        {
            "user_id": pd.Series([u for u, _, _ in evs], dtype="int64"),
            "event_type": [t for _, t, _ in evs],
            "ts": [t0 + pd.Timedelta(minutes=m) for _, _, m in evs],
        }
    )
    out = funnel_shard(g).set_index("user_id").sort_index()
    for u in set(g["user_id"]):
        rows = [(t, ts) for (uu, t, m), ts in zip(evs, g["ts"]) if uu == u]
        t1 = min((ts for t, ts in rows if t == "view"), default=None)
        t2 = (
            min((ts for t, ts in rows if t == "click" and ts > t1), default=None)
            if t1 is not None
            else None
        )
        t3 = (
            min((ts for t, ts in rows if t == "purchase" and ts > t2), default=None)
            if t2 is not None
            else None
        )
        want_stage = (t1 is not None) + (t2 is not None) + (t3 is not None)
        assert out.loc[u, "stage"] == want_stage, (u, evs)
        for col, want in (("t_view", t1), ("t_click", t2), ("t_purchase", t3)):
            got = out.loc[u, col]
            assert (pd.isna(got) and want is None) or got == want, (u, col, evs)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30)),  # (user, week)
        min_size=0,
        max_size=40,
    )
)
def test_retention_shard_matches_bruteforce(pairs):
    from cosmwasm_etl_ray.pipelines.queries_extra import retention_shard

    g = pd.DataFrame(
        {
            "user_id": pd.Series([u for u, _ in pairs], dtype="int64"),
            "week": pd.Series([w for _, w in pairs], dtype="int64"),
        }
    )
    out = retention_shard(g)
    got = {
        (r.cohort_week, r.offset_week): r.n_users for r in out.itertuples()
    }
    want: dict = {}
    by_user: dict = {}
    for u, w in pairs:
        by_user.setdefault(u, set()).add(w)
    for u, weeks in by_user.items():
        first = min(weeks)
        for w in weeks:
            key = (first, w - first)
            want[key] = want.get(key, 0) + 1
    assert got == want, (pairs,)

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                                   # user
            st.integers(0, 20),                                  # minute
            st.floats(-100, 100, allow_nan=False, width=32),     # value
        ),
        min_size=0,
        max_size=30,
    )
)
def test_moving_avg_shard_matches_bruteforce(evs):
    from cosmwasm_etl_ray.pipelines.queries_extra import moving_avg_shard

    t0 = pd.Timestamp("2026-01-01")
    g = pd.DataFrame(
        {
            "event_id": pd.Series(range(len(evs)), dtype="int64"),
            "user_id": pd.Series([u for u, _, _ in evs], dtype="int64"),
            "ts": [t0 + pd.Timedelta(minutes=m) for _, m, _ in evs],
            "value": pd.Series([v for _, _, v in evs], dtype="float64"),
        }
    )
    out = moving_avg_shard(g).set_index("event_id")
    # brute force: per user, ordered by (ts, event_id), mean of the
    # current + up-to-2 preceding values
    per_user: dict = {}
    for eid, (u, m, v) in enumerate(evs):
        per_user.setdefault(u, []).append((g["ts"][eid], eid, float(v)))
    for u, rows in per_user.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        for i, (_, eid, _) in enumerate(rows):
            frame = [v for _, _, v in rows[max(0, i - 2) : i + 1]]
            want = sum(frame) / len(frame)
            assert abs(out.loc[eid, "mov_avg"] - want) < 1e-9, (u, eid, evs)
