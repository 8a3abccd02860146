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
