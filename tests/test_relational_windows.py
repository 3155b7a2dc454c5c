"""Window functions / pivot / rollup / funnel vs pandas brute force on the
sf0.001 events and orders tables."""

import numpy as np
import pandas as pd
import pytest

from fonduer_ray.pipelines import relational

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def events_df(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    df["cents"] = np.rint(df["value"].to_numpy() * 100).astype("int64")
    return df


def test_running_total_matches_pandas(sf_dir, events_df):
    got = (
        relational.events_running_total(sf_dir)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    df = events_df.sort_values(["user_id", "ts", "event_id"])
    df["running_cents"] = df.groupby("user_id")["cents"].cumsum()
    want = df.sort_values("event_id", ignore_index=True)
    pd.testing.assert_series_equal(
        got["running_cents"], want["running_cents"], check_names=False
    )


def test_lag_delta_matches_pandas(sf_dir, events_df):
    got = (
        relational.events_lag_delta(sf_dir)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    df = events_df.sort_values(["user_id", "ts", "event_id"])
    prev = df.groupby("user_id")["cents"].shift(1)
    df["delta_cents"] = (df["cents"] - prev).fillna(0).astype("int64")
    want = df.sort_values("event_id", ignore_index=True)
    pd.testing.assert_series_equal(
        got["delta_cents"], want["delta_cents"], check_names=False
    )


def test_value_rank_is_dense_rowcount_per_user(sf_dir, events_df):
    got = relational.events_value_rank(sf_dir).to_pandas()
    sizes = events_df.groupby("user_id").size()
    per_user = got.groupby("user_id")["value_rank"]
    # row_number semantics: ranks are exactly 1..n per user
    for uid, g in per_user:
        assert sorted(g) == list(range(1, sizes[uid] + 1))
    # top rank goes to the max-cents event (event_id tiebreak)
    df = events_df.sort_values(
        ["user_id", "cents", "event_id"], ascending=[True, False, True]
    )
    top_want = df.groupby("user_id").head(1).set_index("user_id")["event_id"]
    top_got = (
        got[got.value_rank == 1].set_index("user_id")["event_id"]
    )
    pd.testing.assert_series_equal(
        top_got.sort_index(), top_want.sort_index(), check_names=False
    )


def test_events_pivot_row_sums(sf_dir, events_df):
    got = relational.events_pivot(sf_dir).to_pandas()
    want = events_df.groupby(["user_id", "event_type"]).size().unstack(
        fill_value=0
    )
    assert len(got) == events_df["user_id"].nunique()
    g = got.set_index("user_id").sort_index()
    for et in relational.EVENT_TYPES:
        np.testing.assert_array_equal(
            g[f"n_{et}"].to_numpy(),
            want.get(et, pd.Series(0, index=want.index)).sort_index().to_numpy(),
        )
    assert (g["n_total"] == events_df.groupby("user_id").size().sort_index()).all()


def test_orders_rollup_levels_consistent(sf_dir):
    got = relational.orders_rollup(sf_dir).to_pandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    total = got[
        (got.o_orderpriority == "ALL") & (got.o_orderstatus == "ALL")
    ]["n_orders"]
    assert list(total) == [len(orders)]
    lvl1 = got[(got.o_orderstatus == "ALL") & (got.o_orderpriority != "ALL")]
    want1 = orders.groupby("o_orderpriority").size()
    for _, r in lvl1.iterrows():
        assert r.n_orders == want1[r.o_orderpriority]
    leaves = got[(got.o_orderstatus != "ALL")]
    assert leaves.n_orders.sum() == len(orders)


def test_funnel_counts_match_pandas(sf_dir, events_df):
    got = relational.signup_purchase_funnel(sf_dir).to_pandas()
    su = (
        events_df[events_df.event_type == "signup"]
        .groupby("user_id")["ts"]
        .min()
    )
    pu = events_df[events_df.event_type == "purchase"][["user_id", "ts"]]
    conv = 0
    for uid, t0 in su.items():
        w = pu[(pu.user_id == uid) & (pu.ts >= t0)
               & (pu.ts <= t0 + pd.Timedelta(days=7))]
        conv += int(len(w) > 0)
    m = dict(zip(got.converted, got.n_users))
    assert m.get(1, 0) == conv
    assert m.get(0, 0) == len(su) - conv


def test_session_duration_stats_matches_brute(tmp_path, ray_session):
    """Sessionize-then-percentile composition: brute-forced on events with
    sub-second timestamps, a tie at a session boundary, and single-event
    (zero-duration) sessions."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.relational import session_duration_stats

    base = np.datetime64("2024-01-01T00:00:00.500000", "us")
    rows = []
    eid = 0
    rng = np.random.RandomState(3)
    for user in range(1, 6):
        t = base
        for _ in range(rng.randint(5, 40)):
            eid += 1
            rows.append({"event_id": eid, "ts": t, "user_id": user,
                         "event_type": "x", "value": 0.0, "props": ""})
            # mix sub-gap and super-gap jumps, with microsecond fractions
            step = int(rng.choice([7, 61, 1799, 1801, 7200]) * 1e6) + int(
                rng.randint(0, 1_000_000)
            )
            t = t + np.timedelta64(step, "us")
    # duplicate-timestamp pair (diff 0 stays in-session)
    for _ in range(2):
        eid += 1
        rows.append({"event_id": eid, "ts": base, "user_id": 9,
                     "event_type": "x", "value": 0.0, "props": ""})
    df = pd.DataFrame(rows)
    d = tmp_path / "sess"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))

    got = {
        int(r["pct"]): r["duration_s"]
        for r in session_duration_stats(str(d)).take_all()
    }

    durs = []
    for _, g in df.groupby("user_id"):
        us = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        breaks = np.flatnonzero(np.diff(us) > 30 * 60 * 1_000_000) + 1
        for seg in np.split(us, breaks):
            durs.append((seg[-1] - seg[0]) // 1_000_000)
    durs.sort()
    n = len(durs)
    for pct in (50, 90, 99):
        want = float(durs[max(1, math.ceil(pct * n / 100)) - 1])
        assert got[pct] == want, (pct, got, durs)


def test_event_type_trigrams_brute(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.relational import event_type_trigrams

    rng = __import__("numpy").random.default_rng(9)
    n = 200
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": rng.integers(0, 8, n),
            "event_type": rng.choice(list("abc"), n),
            "ts": pd.to_datetime(rng.integers(0, 50, n), unit="s"),
            "value": 0.0,
            "props": "",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    got = (
        event_type_trigrams(str(tmp_path))
        .to_pandas()
        .sort_values(["t1", "t2", "t3"], ignore_index=True)
    )
    want: dict[tuple, int] = {}
    for _, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        ev = g["event_type"].tolist()
        for i in range(len(ev) - 2):
            want[tuple(ev[i : i + 3])] = want.get(tuple(ev[i : i + 3]), 0) + 1
    want_df = (
        pd.DataFrame(
            [(a, b, c, v) for (a, b, c), v in want.items()],
            columns=["t1", "t2", "t3", "n"],
        )
        .sort_values(["t1", "t2", "t3"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}), want_df.astype({"n": "int64"}))
