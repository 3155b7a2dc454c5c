"""Brute-force checks: weekly retention cohorts, fixed-bin value
histogram, and per-stratum rate sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from fonduer_ray.functions.dedup import _md5_64
from fonduer_ray.functions.training import stratified_sample
from fonduer_ray.pipelines.relational import retention_cohorts, value_histogram

WEEK = 7 * 24 * 3600


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Users with first events in two different weeks and varied return
    patterns (incl. returns past the horizon and repeat visits in one
    week, which must not double-count)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")  # mid-week anchor
    rows = []
    eid = 0

    def ev(user, week_off, extra_s=0):
        nonlocal eid
        eid += 1
        rows.append(
            {
                "event_id": eid,
                "ts": base + np.timedelta64(week_off * WEEK + extra_s, "s"),
                "user_id": user,
                "event_type": "view",
                "value": float(user) + week_off / 10.0,
                "props": "",
            }
        )

    ev(1, 0); ev(1, 0, 60); ev(1, 1); ev(1, 3); ev(1, 5)   # cohort w0
    ev(2, 0); ev(2, 2)                                     # cohort w0
    ev(3, 1); ev(3, 1, 120); ev(3, 2); ev(3, 4)            # cohort w1
    ev(4, 1)                                               # cohort w1, no return
    df = pd.DataFrame(rows)
    out = tmp_path_factory.mktemp("retention_events")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(out / "events.parquet"))
    return str(out), df


def test_retention_cohorts_matches_bruteforce(ray_session, events_dir):
    sf_dir, df = events_dir
    wk = df["ts"].values.astype("datetime64[s]").astype("int64") // WEEK
    u = pd.DataFrame({"user_id": df["user_id"], "wk": wk})
    first = u.groupby("user_id")["wk"].transform("min")
    offs = u["wk"] - first
    keep = offs <= 3
    want = (
        pd.DataFrame(
            {"cohort_week": first[keep], "week_offset": offs[keep],
             "user_id": u["user_id"][keep]}
        )
        .drop_duplicates()
        .groupby(["cohort_week", "week_offset"])
        .size()
        .rename("n_users")
        .reset_index()
    )
    got = (
        retention_cohorts(sf_dir)
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got, want.sort_values(["cohort_week", "week_offset"], ignore_index=True)
    )
    # the fixture exercises: same-week repeats collapse, horizon cut
    w0 = got[got.cohort_week == got.cohort_week.min()]
    assert w0[w0.week_offset == 0].n_users.iloc[0] == 2  # users 1 and 2


def test_value_histogram_matches_bruteforce(ray_session, events_dir):
    sf_dir, df = events_dir
    cents = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    want = (
        pd.DataFrame({"bin": cents // 5000, "cents": cents})
        .groupby("bin")["cents"]
        .agg(n="size", cents="sum")
        .reset_index()
    )
    want["sum_value"] = want.cents / 100.0
    want = want[["bin", "n", "sum_value"]].astype({"n": "int64"})
    got = value_histogram(sf_dir).to_pandas().sort_values("bin", ignore_index=True)
    pd.testing.assert_frame_equal(got, want.sort_values("bin", ignore_index=True))


def test_stratified_sample_rates(ray_session):
    ds = ray.data.from_items(
        [{"grp": ["a", "b", "c"][i % 3], "k": i} for i in range(3000)]
    )
    out = stratified_sample(ds, "grp", "k", {"a": 100, "b": 30}).take_all()
    got = {(r["grp"], r["k"]) for r in out}
    want = {
        (["a", "b", "c"][i % 3], i)
        for i in range(3000)
        if _md5_64(str(i)) % 100 < {"a": 100, "b": 30}.get(["a", "b", "c"][i % 3], 0)
    }
    assert got == want
    # rate sanity: all of a, ~30% of b, none of c
    n_a = sum(1 for g, _ in got if g == "a")
    n_b = sum(1 for g, _ in got if g == "b")
    n_c = sum(1 for g, _ in got if g == "c")
    assert n_a == 1000 and n_c == 0 and 200 < n_b < 400


def test_event_transitions_matches_bruteforce(ray_session, events_dir):
    from fonduer_ray.pipelines.relational import event_transitions

    sf_dir, df = events_dir
    s = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    same = s["user_id"].shift(-1) == s["user_id"]
    want = (
        pd.DataFrame({"src": s["event_type"], "dst": s["event_type"].shift(-1)})[same]
        .groupby(["src", "dst"])
        .size()
        .rename("n")
        .reset_index()
    )
    got = (
        event_transitions(sf_dir)
        .to_pandas()
        .sort_values(["src", "dst"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want.sort_values(["src", "dst"], ignore_index=True))
