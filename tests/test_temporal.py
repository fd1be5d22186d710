"""Temporal operators (stages/temporal.py) vs DuckDB oracles: tumbling and
sliding windowed aggregates, backward as-of join (tolerance + tie rules),
interval range join (half-open containment, cross-bucket intervals)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.stages.temporal import asof_join, range_join, windowed_aggregate

HOUR = 3_600_000_000


@pytest.fixture(scope="module")
def ev():
    rng = np.random.default_rng(7)
    n = 4000
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 50, n).astype(np.int64),
            "ts_us": rng.integers(0, HOUR * 48, n).astype(np.int64),
            "value": rng.normal(10, 3, n),
            "etype": rng.choice(["a", "b", "c"], n),
        }
    )


def test_tumbling_window(ev):
    out = (
        windowed_aggregate(
            rd.from_pandas(ev), ts_us_col="ts_us", window_us=HOUR,
            key_cols=["etype"], value_col="value", num_partitions=4,
        )
        .to_pandas()
        .sort_values(["etype", "window_start_us"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", ev)
    ora = con.execute(
        f"""SELECT etype, (ts_us // {HOUR}) * {HOUR} AS window_start_us,
        CAST(COUNT(*) AS BIGINT) n_rows, SUM(value) sum_value,
        MIN(value) min_value, MAX(value) max_value
        FROM ev GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    assert len(out) == len(ora)
    assert (out["n_rows"].values == ora["n_rows"].values).all()
    assert np.allclose(out["sum_value"], ora["sum_value"])
    assert np.allclose(out["min_value"], ora["min_value"])
    assert np.allclose(out["max_value"], ora["max_value"])


def test_sliding_window_and_count_only(ev):
    out = (
        windowed_aggregate(
            rd.from_pandas(ev), ts_us_col="ts_us", window_us=3 * HOUR,
            slide_us=HOUR, key_cols=["etype"], value_col="value",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["etype", "window_start_us"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", ev)
    ora = con.execute(
        f"""SELECT etype, ((ts_us // {HOUR}) - j) * {HOUR} AS window_start_us,
        CAST(COUNT(*) AS BIGINT) n_rows, SUM(value) sum_value
        FROM ev CROSS JOIN (SELECT UNNEST(range(3)) AS j) js
        GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    assert len(out) == len(ora)
    assert (out["n_rows"].values == ora["n_rows"].values).all()
    assert np.allclose(out["sum_value"], ora["sum_value"])
    # every row lands in exactly window/slide windows
    assert out["n_rows"].sum() == 3 * len(ev)

    # count-only (no value_col), global key (none)
    cnt = windowed_aggregate(
        rd.from_pandas(ev), ts_us_col="ts_us", window_us=HOUR, num_partitions=4
    ).to_pandas()
    assert cnt["n_rows"].sum() == len(ev)
    with pytest.raises(ValueError):
        windowed_aggregate(
            rd.from_pandas(ev), ts_us_col="ts_us", window_us=HOUR, slide_us=7
        )


def test_asof_join_backward_tolerance(ev):
    L = ev[ev.etype != "a"][["event_id", "user_id", "ts_us"]]
    R = ev[ev.etype == "a"].rename(columns={"event_id": "rid", "ts_us": "rts"})[
        ["rid", "user_id", "rts"]
    ]
    tol = 2 * HOUR
    out = (
        asof_join(
            rd.from_pandas(L), rd.from_pandas(R), left_key="user_id",
            right_key="user_id", left_ts="ts_us", right_ts="rts",
            right_cols=["rid", "rts"], tolerance_us=tol, num_partitions=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    ora = con.execute(
        f"""WITH j AS (
        SELECT L.event_id, R.rid, R.rts,
               ROW_NUMBER() OVER (PARTITION BY L.event_id
                                  ORDER BY R.rts DESC, R.rid DESC) rn
        FROM L JOIN R ON L.user_id = R.user_id
             AND R.rts <= L.ts_us AND L.ts_us - R.rts <= {tol})
        SELECT L.event_id, j.rid, j.rts
        FROM L LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
        ORDER BY event_id"""
    ).df()
    assert len(out) == len(ora)
    assert (
        out["rid"].fillna(-1).astype(np.int64).values
        == ora["rid"].fillna(-1).astype(np.int64).values
    ).all()
    assert (
        out["rts"].fillna(-1).astype(np.int64).values
        == ora["rts"].fillna(-1).astype(np.int64).values
    ).all()
    # left row count preserved (LEFT join), unmatched rows are null
    assert len(out) == len(L)
    assert out["rid"].isna().any()


def test_asof_tie_breaks_to_largest_first_right_col():
    L = pd.DataFrame({"lid": [0], "k": [1], "ts": [100]})
    R = pd.DataFrame({"rid": [7, 9, 3], "k": [1, 1, 1], "rts": [50, 50, 50]})
    out = asof_join(
        rd.from_pandas(L), rd.from_pandas(R), left_key="k", right_key="k",
        left_ts="ts", right_ts="rts", right_cols=["rid"], num_partitions=2,
    ).to_pandas()
    assert out["rid"].tolist() == [9]  # max rid among equal (key, ts)


def test_range_join_containment(ev):
    I = ev[ev.etype == "a"].copy()
    I["start_us"] = I["ts_us"]
    I["end_us"] = I["ts_us"] + 2 * HOUR
    I = I[["event_id", "user_id", "start_us", "end_us"]].rename(
        columns={"event_id": "iid"}
    )
    P = ev[ev.etype != "a"][["event_id", "user_id", "ts_us"]]
    # bucket narrower than the interval: forces multi-bucket duplication
    out = (
        range_join(
            rd.from_pandas(P), rd.from_pandas(I), point_key="user_id",
            interval_key="user_id", point_ts="ts_us", start_ts="start_us",
            end_ts="end_us", point_cols=["event_id"], interval_cols=["iid"],
            bucket_us=HOUR // 2, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["event_id", "iid"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("I", I)
    con.register("P", P)
    ora = con.execute(
        """SELECT P.event_id, I.iid FROM P JOIN I ON P.user_id = I.user_id
        AND P.ts_us >= I.start_us AND P.ts_us < I.end_us ORDER BY 1, 2"""
    ).df()
    assert len(out) == len(ora)
    assert (out["event_id"].values == ora["event_id"].values).all()
    assert (out["iid"].values == ora["iid"].values).all()


def test_range_join_half_open_and_empty_intervals():
    P = pd.DataFrame({"pid": [0, 1, 2], "k": [1, 1, 1], "ts": [10, 20, 30]})
    I = pd.DataFrame(
        {"iid": [100, 101], "k": [1, 1], "s": [10, 25], "e": [20, 25]}
    )  # [10,20) catches ts=10 only; [25,25) is empty
    out = range_join(
        rd.from_pandas(P), rd.from_pandas(I), point_key="k", interval_key="k",
        point_ts="ts", start_ts="s", end_ts="e", point_cols=["pid"],
        interval_cols=["iid"], bucket_us=16, num_partitions=2,
    ).to_pandas()
    assert sorted(map(tuple, out[["pid", "iid"]].values.tolist())) == [(0, 100)]


# --------------------------------------------------- event transitions


def _transitions_oracle(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("ev", df)
    out = con.execute(
        """
        WITH ord AS (
          SELECT etype AS src_type,
                 LEAD(etype) OVER (PARTITION BY uid ORDER BY ts, eid)
                   AS dst_type
          FROM ev
        ), pairs AS (
          SELECT src_type, dst_type, COUNT(*) AS n FROM ord
          WHERE dst_type IS NOT NULL GROUP BY 1, 2
        ), tot AS (SELECT src_type, SUM(n) AS t FROM pairs GROUP BY 1)
        SELECT p.src_type, p.dst_type, CAST(p.n AS BIGINT) AS n,
               CAST((2000000 * CAST(p.n AS HUGEINT) + t.t) // (2 * t.t)
                    AS BIGINT) AS p_micro
        FROM pairs p JOIN tot t USING (src_type) ORDER BY 1, 2
        """
    ).df()
    con.close()
    return out


def test_event_transitions_matches_sql(ray_session):
    from graphx_ray.stages.temporal import event_transitions

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "uid": rng.integers(0, 60, n),
            "ts": rng.integers(0, 500, n).astype(np.int64),  # many ts ties
            "eid": np.arange(n, dtype=np.int64),
            "etype": rng.choice(list("abcde"), n),
        }
    )
    out = (
        event_transitions(
            rd.from_pandas(df), key_col="uid", ts_us_col="ts",
            type_col="etype", tiebreak_col="eid", num_partitions=4,
        )
        .to_pandas()
        .sort_values(["src_type", "dst_type"])
        .reset_index(drop=True)
    )
    ora = _transitions_oracle(df)
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)
    # probabilities row-normalize to ~1e6 per src (half-up rounding slack)
    s = out.groupby("src_type")["p_micro"].sum()
    assert ((s - 1_000_000).abs() <= len(out)).all()


def test_event_transitions_parallelism_invariant(ray_session):
    from graphx_ray.stages.temporal import event_transitions

    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame(
        {
            "uid": rng.integers(0, 10, n),
            "ts": rng.integers(0, 50, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
            "etype": rng.choice(list("abc"), n),
        }
    )
    frames = []
    for parts, blocks in ((2, 1), (7, 13)):
        src = rd.from_pandas(df).repartition(blocks)
        frames.append(
            event_transitions(
                src, key_col="uid", ts_us_col="ts", type_col="etype",
                tiebreak_col="eid", num_partitions=parts,
            )
            .to_pandas()
            .sort_values(["src_type", "dst_type"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames[0], frames[1])


# ---------------------------------------------------- cohort retention


def test_cohort_retention_matches_sql(ray_session):
    from graphx_ray.stages.temporal import cohort_retention

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "uid": rng.integers(0, 120, n),
            "ts": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    out = (
        cohort_retention(
            rd.from_pandas(df), key_col="uid", ts_us_col="ts",
            period_us=100, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["cohort", "period"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", df)
    ora = con.execute(
        """
        WITH dp AS (SELECT DISTINCT uid, ts // 100 AS per FROM ev),
        anc AS (SELECT uid, MIN(per) AS cohort FROM dp GROUP BY uid),
        act AS (
          SELECT a.cohort, d.per - a.cohort AS period,
                 CAST(COUNT(*) AS BIGINT) AS n_active
          FROM dp d JOIN anc a USING (uid) GROUP BY 1, 2
        ),
        sz AS (SELECT cohort, n_active AS cohort_size FROM act WHERE period = 0)
        SELECT act.cohort, act.period, act.n_active, sz.cohort_size,
               CAST((2000000 * CAST(act.n_active AS HUGEINT) + sz.cohort_size)
                    // (2 * sz.cohort_size) AS BIGINT) AS retention_micro
        FROM act JOIN sz USING (cohort) ORDER BY 1, 2
        """
    ).df()
    con.close()
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)
    # period-0 anchors: retention exactly 1e6, n_active == cohort_size
    k0 = out[out.period == 0]
    assert (k0.retention_micro == 1_000_000).all()
    assert (k0.n_active == k0.cohort_size).all()


def test_cohort_retention_parallelism_invariant(ray_session):
    from graphx_ray.stages.temporal import cohort_retention

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "uid": rng.integers(0, 30, 1200),
            "ts": rng.integers(0, 400, 1200).astype(np.int64),
        }
    )
    frames = []
    for parts, blocks in ((2, 1), (5, 11)):
        frames.append(
            cohort_retention(
                rd.from_pandas(df).repartition(blocks), key_col="uid",
                ts_us_col="ts", period_us=50, num_partitions=parts,
            )
            .to_pandas()
            .sort_values(["cohort", "period"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_event_gaps_pinned_order_and_attribution(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from graphx_ray.stages.temporal import event_gaps

    ev = pd.DataFrame({
        "user_id":   [1, 1, 1, 2, 2, 3],
        "ts_us":     [10, 30, 30, 5, 100, 7],
        "event_id":  [1, 3, 2, 4, 5, 6],  # ties at ts=30 break by id: 2 then 3
        "event_type": ["a", "b", "c", "a", "b", "a"],
    })
    got = (
        event_gaps(rd.from_pandas(ev), key_col="user_id", ts_us_col="ts_us",
                   tiebreak_col="event_id", type_col="event_type",
                   num_partitions=3)
        .to_pandas().sort_values(["key", "gap_us", "event_type"]).reset_index(drop=True)
    )
    # user 1 ordered: (10,id1,a) → (30,id2,c) → (30,id3,b):
    #   gaps 20 (type c), 0 (type b); user 2: 95 (type b); user 3: none
    want = pd.DataFrame(
        {"key": [1, 1, 2], "event_type": ["b", "c", "b"],
         "gap_us": [0, 20, 95]}
    ).sort_values(["key", "gap_us", "event_type"]).reset_index(drop=True)
    assert got[["key", "event_type", "gap_us"]].equals(want[["key", "event_type", "gap_us"]])
    # parallelism invariance + non-negativity on a random stream
    rng = np.random.default_rng(4)
    big = pd.DataFrame({
        "user_id": rng.integers(0, 20, 500).astype(np.int64),
        "ts_us": rng.integers(0, 1000, 500).astype(np.int64),
        "event_id": np.arange(500, dtype=np.int64),
        "event_type": rng.choice(["x", "y"], 500),
    })
    a = event_gaps(rd.from_pandas(big), key_col="user_id", ts_us_col="ts_us",
                   tiebreak_col="event_id", type_col="event_type",
                   num_partitions=2).to_pandas()
    b = event_gaps(rd.from_pandas(big).repartition(11), key_col="user_id",
                   ts_us_col="ts_us", tiebreak_col="event_id",
                   type_col="event_type", num_partitions=5).to_pandas()
    key = ["key", "event_type", "gap_us"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    assert (a["gap_us"] >= 0).all()
    assert len(a) == len(big) - big["user_id"].nunique()
