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
