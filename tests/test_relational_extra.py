"""As-of join and time-band range join: brute-force cross-checks on a
synthetic events table engineered to cross granule boundaries and hit ties."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fonduer_ray.pipelines.relational import events_asof_join, events_range_join


@pytest.fixture(scope="module")
def tiny_events(tmp_path_factory):
    """Deterministic events table: 3 users, timestamps that straddle the
    5-minute range-join granules, a ts tie on the right side, and a click
    with no prior view (unmatched path)."""
    rng = np.random.RandomState(7)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    eid = 0
    for user in (1, 2, 3):
        for _ in range(120):
            eid += 1
            off = int(rng.randint(0, 3 * 24 * 3600))
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + np.timedelta64(off, "s"),
                    "user_id": user,
                    "event_type": ["click", "view", "error", "purchase"][
                        rng.randint(4)
                    ],
                    "value": float(rng.rand()),
                    "props": "",
                }
            )
    # exact-ts tie: two views at the same instant before a click
    t0 = base + np.timedelta64(10, "s")
    for etype, ts in [("view", t0), ("view", t0), ("click", t0)]:
        eid += 1
        rows.append(
            {"event_id": eid, "ts": ts, "user_id": 9, "event_type": etype,
             "value": 0.0, "props": ""}
        )
    # a click with no view at all for that user
    eid += 1
    rows.append(
        {"event_id": eid, "ts": base, "user_id": 10, "event_type": "click",
         "value": 0.0, "props": ""}
    )
    df = pd.DataFrame(rows)
    out = tmp_path_factory.mktemp("tiny_events")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(out / "events.parquet"))
    return str(out), df


def brute_asof(df):
    out = {}
    clicks = df[df.event_type == "click"]
    views = df[df.event_type == "view"]
    for _, c in clicks.iterrows():
        cand = views[(views.user_id == c.user_id) & (views.ts <= c.ts)]
        if len(cand):
            best = cand.sort_values(["ts", "event_id"]).iloc[-1]
            out[c.event_id] = int(best.event_id)
        else:
            out[c.event_id] = -1
    return out


def test_asof_join_matches_bruteforce(ray_session, tiny_events):
    sf_dir, df = tiny_events
    got = {r["event_id"]: r["matched_event_id"]
           for r in events_asof_join(sf_dir).take_all()}
    assert got == brute_asof(df)


def test_asof_tie_breaks_to_max_event_id(ray_session, tiny_events):
    sf_dir, df = tiny_events
    tie_click = df[(df.user_id == 9) & (df.event_type == "click")].iloc[0]
    tie_views = df[(df.user_id == 9) & (df.event_type == "view")]
    got = {r["event_id"]: r["matched_event_id"]
           for r in events_asof_join(sf_dir).take_all()}
    assert got[tie_click.event_id] == tie_views.event_id.max()


def brute_range(df, band_s=300):
    pairs = set()
    a = df[df.event_type == "error"]
    b = df[df.event_type == "purchase"]
    for _, x in a.iterrows():
        for _, y in b.iterrows():
            if abs((y.ts - x.ts).total_seconds()) <= band_s:
                pairs.add((int(x.event_id), int(y.event_id)))
    return pairs


def test_range_join_matches_bruteforce(ray_session, tiny_events):
    sf_dir, df = tiny_events
    got = {(r["left_id"], r["right_id"])
           for r in events_range_join(sf_dir).take_all()}
    rows = events_range_join(sf_dir).take_all()
    assert len(rows) == len(got), "granule replication duplicated a pair"
    assert got == brute_range(df)


def test_range_join_boundary_inclusive(ray_session, tmp_path):
    """A purchase exactly band away (and exactly on a granule edge) pairs."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [base + np.timedelta64(300, "s"),          # error at granule edge
                   base,                                      # purchase -band
                   base + np.timedelta64(600, "s"),           # purchase +band
                   base + np.timedelta64(601, "s")],          # just outside
            "user_id": [1, 2, 3, 4],
            "event_type": ["error", "purchase", "purchase", "purchase"],
            "value": [0.0] * 4,
            "props": [""] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = {(r["left_id"], r["right_id"])
           for r in events_range_join(str(tmp_path)).take_all()}
    assert got == {(1, 2), (1, 3)}


def test_profile_columns_with_nulls(ray_session):
    """Profiler vs pandas ground truth on a table WITH nulls (the driver
    testdata has none, so the null path needs its own coverage)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    import ray.data

    from fonduer_ray.pipelines.relational import profile_columns

    t = pa.table(
        {
            "k": pa.array([1, 2, None, 2, 5, None], pa.int64()),
            "v": pa.array([1.25, None, 3.5, 1.25, -2.75, 0.0], pa.float64()),
            "s": pa.array(["a", "b", None, "a", "c", "b"], pa.string()),
        }
    )
    out = {
        r["column"]: r
        for r in profile_columns(
            ray.data.from_arrow(t).repartition(3),
            {"k": "int", "v": "cents", "s": "str"},
        ).take_all()
    }
    assert (out["k"]["n_rows"], out["k"]["n_nulls"]) == (6, 2)
    assert out["k"]["n_distinct"] == 3  # 1, 2, 5
    assert (out["k"]["min_i"], out["k"]["max_i"]) == (1, 5)
    assert (out["v"]["n_nulls"], out["v"]["n_distinct"]) == (1, 4)
    assert (out["v"]["min_i"], out["v"]["max_i"]) == (-275, 350)
    assert (out["s"]["n_nulls"], out["s"]["n_distinct"]) == (1, 3)
    assert out["s"]["min_i"] is None and out["s"]["max_i"] is None
