"""Driver-contract conformance at sf0.001 (fast subset of the sf0.01 gate),
plus pytest oracles for the rows-only queries (cc_lineitem vs networkx,
lpa_orders vs the pinned A.3 rule)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod
from oracles import lpa_oracle

SF = "/root/testdata/sf0.001"

SQL_CHECKED = [
    "degrees_orders",
    "edge_weights_lineitem",
    "cc_orders",
    "pagerank_chain",
    "triangles_events",
    "zone_pairs_events",
    "token_counts_documents",
    "quality_documents",
    "exact_dedup_documents",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def to_df(x) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(x, Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, con):
    got = norm(to_df(entrymod.queries()[name](SF)))
    want = norm(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert np.array_equal(a, b), f"column {c} differs"


def test_entry_smoke():
    out = entrymod.entry()
    assert len(out) > 0
    assert {"vid", "rank", "component"} <= set(out.columns)


def test_cc_lineitem_vs_networkx(con):
    import networkx as nx

    got = to_df(entrymod.queries()["cc_lineitem"](SF)).sort_values("vid").reset_index(drop=True)
    e = con.sql(
        f"SELECT l_orderkey AS u, l_partkey + {entrymod.PART_OFF} AS v FROM lineitem"
    ).df()
    g = nx.Graph()
    g.add_edges_from(zip(e["u"], e["v"]))
    want = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            want[v] = m
    wdf = (
        pd.DataFrame({"vid": list(want), "component": list(want.values())})
        .astype("int64")
        .sort_values("vid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, wdf, check_dtype=False)
    # components genuinely merge (parts shared across orders)
    assert wdf.groupby("component").size().max() > 2


def test_lpa_orders_vs_pinned_oracle(con):
    got = to_df(entrymod.queries()["lpa_orders"](SF)).sort_values("vid").reset_index(drop=True)
    e = con.sql(
        f"SELECT o_custkey AS src, o_orderkey + {entrymod.ORDER_OFF} AS dst FROM orders"
    ).df()
    e["w"] = 1
    verts = np.unique(np.concatenate([e["src"], e["dst"]]))
    want = lpa_oracle(e, verts, max_iter=3).sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
