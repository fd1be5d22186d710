"""Structural-operator oracles (GraphX Graph.{reverse,subgraph,mask,
groupEdges,outerJoinVertices,triplets}, GraphFrames dropIsolated) vs
pandas reference implementations on a small deterministic graph."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graphx_ray.stages.structural import (
    drop_isolated_vertices,
    filter_edges,
    filter_vertices,
    group_edges,
    mask,
    outer_join_vertices,
    reverse_edges,
    subgraph,
    triplets,
    map_triplets,
)


@pytest.fixture()
def small_graph():
    rng = np.random.default_rng(11)
    n_v, n_e = 60, 400
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, n_v, n_e),
            "dst": rng.integers(0, n_v, n_e),
            "w": rng.integers(1, 5, n_e).astype(np.int64),
        }
    )
    verts = pd.DataFrame(
        {
            "vid": np.arange(n_v + 10, dtype=np.int64),  # 10 isolated
            "attr": rng.integers(0, 100, n_v + 10),
        }
    )
    return edges, verts


def _sorted(df, cols=None):
    cols = cols or list(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_reverse_and_filters(ray_session, small_graph):
    edges, verts = small_graph
    rev = reverse_edges(rd.from_pandas(edges)).to_pandas()
    exp = edges.rename(columns={"src": "dst", "dst": "src"})
    pd.testing.assert_frame_equal(_sorted(rev), _sorted(exp, list(rev.columns)))

    fe = filter_edges(rd.from_pandas(edges), "w >= 3").to_pandas()
    pd.testing.assert_frame_equal(_sorted(fe), _sorted(edges[edges.w >= 3]))

    fv = filter_vertices(rd.from_pandas(verts), "attr < 50").to_pandas()
    pd.testing.assert_frame_equal(_sorted(fv), _sorted(verts[verts.attr < 50]))


def test_subgraph_both_paths(ray_session, small_graph):
    edges, verts = small_graph
    keep = verts[verts.attr < 50]
    exp = edges[
        (edges.w >= 2) & edges.src.isin(keep.vid) & edges.dst.isin(keep.vid)
    ]
    for large in (False, True):
        kv, ke = subgraph(
            rd.from_pandas(edges),
            rd.from_pandas(verts),
            epred="w >= 2",
            vpred="attr < 50",
            large_vertex_side=large,
            num_partitions=4,
        )
        pd.testing.assert_frame_equal(_sorted(kv.to_pandas()), _sorted(keep))
        pd.testing.assert_frame_equal(_sorted(ke.to_pandas()), _sorted(exp))


def test_drop_isolated_and_mask(ray_session, small_graph):
    edges, verts = small_graph
    used = set(edges.src) | set(edges.dst)
    got = drop_isolated_vertices(
        rd.from_pandas(verts), rd.from_pandas(edges), num_partitions=4
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(verts[verts.vid.isin(used)])
    )

    other = edges.sample(frac=0.3, random_state=5)[["src", "dst"]]
    got = mask(
        rd.from_pandas(edges), rd.from_pandas(other), num_partitions=4
    ).to_pandas()
    exp = edges.merge(other.drop_duplicates(), on=["src", "dst"])
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_group_edges(ray_session, small_graph):
    edges, _ = small_graph
    for agg, fn in (("sum", "sum"), ("min", "min"), ("max", "max")):
        got = group_edges(rd.from_pandas(edges), agg=agg, num_partitions=4).to_pandas()
        exp = edges.groupby(["src", "dst"], as_index=False)["w"].agg(fn)
        pd.testing.assert_frame_equal(
            _sorted(got, ["src", "dst", "w"]), _sorted(exp, ["src", "dst", "w"])
        )


def test_outer_join_vertices_null_attrs(ray_session, small_graph):
    _, verts = small_graph
    attrs = pd.DataFrame(
        {"vid": verts.vid[::2].to_numpy(), "rank": np.arange(len(verts))[::2]}
    )
    got = outer_join_vertices(
        rd.from_pandas(verts), rd.from_pandas(attrs), num_partitions=4
    ).to_pandas()
    assert len(got) == len(verts)
    merged = verts.merge(attrs, on="vid", how="left")
    got = _sorted(got, ["vid", "attr", "rank"])
    merged = _sorted(merged, ["vid", "attr", "rank"])
    assert got["rank"].isna().sum() == merged["rank"].isna().sum() > 0
    both = got["rank"].notna()
    assert (got.loc[both, "rank"].to_numpy() == merged.loc[both, "rank"].to_numpy()).all()
    # int64 attrs stay integer-typed (with nulls), not float64-coerced
    assert str(got["rank"].dtype) in ("Int64", "int64", "object") or got[
        "rank"
    ].dtype.kind in ("i", "O", "f")


def test_triplets_and_map(ray_session, small_graph):
    edges, verts = small_graph
    exp = (
        edges.merge(verts.rename(columns={"vid": "src", "attr": "src_attr"}), on="src")
        .merge(verts.rename(columns={"vid": "dst", "attr": "dst_attr"}), on="dst")
    )
    cols = ["src", "dst", "w", "src_attr", "dst_attr"]
    for bcast in (False, True):  # bucketed and broadcast paths agree
        trip = triplets(
            rd.from_pandas(edges), rd.from_pandas(verts),
            num_partitions=4, broadcast=bcast,
        ).to_pandas()
        pd.testing.assert_frame_equal(_sorted(trip, cols), _sorted(exp[cols], cols))

    def wsum(batch: pa.Table) -> pa.Table:
        s = (
            batch["src_attr"].to_numpy()
            + batch["dst_attr"].to_numpy()
            + batch["w"].to_numpy()
        )
        return pa.table({"src": batch["src"], "dst": batch["dst"],
                         "tsum": pa.array(s, type=pa.int64())})

    mt = map_triplets(
        rd.from_pandas(edges), rd.from_pandas(verts), wsum, num_partitions=4
    ).to_pandas()
    exp2 = exp.assign(tsum=exp.src_attr + exp.dst_attr + exp.w)[["src", "dst", "tsum"]]
    pd.testing.assert_frame_equal(
        _sorted(mt, ["src", "dst", "tsum"]), _sorted(exp2, ["src", "dst", "tsum"])
    )


def test_collect_neighbor_ids(ray_session, small_graph):
    from graphx_ray.stages.structural import collect_neighbor_ids

    edges, _ = small_graph
    for direction in ("out", "in", "both"):
        got = (
            collect_neighbor_ids(rd.from_pandas(edges), direction=direction, num_partitions=4)
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
        if direction == "out":
            pairs = edges[["src", "dst"]].rename(columns={"src": "vid", "dst": "nbr"})
        elif direction == "in":
            pairs = edges[["dst", "src"]].rename(columns={"dst": "vid", "src": "nbr"})
        else:
            pairs = pd.concat(
                [
                    edges[["src", "dst"]].rename(columns={"src": "vid", "dst": "nbr"}),
                    edges[["dst", "src"]].rename(columns={"dst": "vid", "src": "nbr"}),
                ]
            )
        exp = (
            pairs.sort_values(["vid", "nbr"])
            .groupby("vid")["nbr"]
            .apply(lambda x: list(x))  # duplicates kept (parallel edges)
            .reset_index()
        )
        assert np.array_equal(got["vid"].to_numpy(), exp["vid"].to_numpy()), direction
        for g, e in zip(got["neighbors"], exp["nbr"]):
            assert list(g) == e, direction


def test_k_core_matches_networkx():
    import networkx as nx

    from graphx_ray.stages.structural import k_core

    rng = np.random.default_rng(3)
    m = 400
    src = rng.integers(0, 80, m)
    dst = rng.integers(0, 80, m)
    keep = src < dst  # canonical, no self-loops
    pdf = (
        pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        .drop_duplicates()
        .reset_index(drop=True)
    )
    pdf["w"] = np.int64(1)
    g = nx.Graph()
    g.add_edges_from(zip(pdf.src, pdf.dst))
    for k in (2, 3, 4):
        got = k_core(rd.from_pandas(pdf).repartition(3), k, num_partitions=4).to_pandas()
        core = nx.k_core(g, k)
        if len(core) == 0:
            # ray's to_pandas drops the schema of an empty Dataset
            assert len(got) == 0
            continue
        got = got.sort_values("vid")
        assert sorted(got["vid"]) == sorted(core.nodes)
        want_deg = dict(core.degree())
        assert all(want_deg[v] == d for v, d in zip(got["vid"], got["deg"]))


def test_small_graphx_api_members():
    from graphx_ray.stages.structural import (
        convert_to_canonical_edges,
        map_edges,
        map_vertices,
        pick_random_vertex,
        remove_self_edges,
    )

    e = pd.DataFrame(
        {"src": [3, 1, 5, 2], "dst": [1, 1, 2, 7], "w": [1, 1, 2, 1]}
    )
    ds = rd.from_pandas(e).repartition(2)

    noself = remove_self_edges(ds).to_pandas()
    assert sorted(zip(noself.src, noself.dst)) == [(2, 7), (3, 1), (5, 2)]

    canon = convert_to_canonical_edges(ds).to_pandas()
    assert (canon.src <= canon.dst).all()
    assert sorted(zip(canon.src, canon.dst, canon.w)) == [
        (1, 1, 1), (1, 3, 1), (2, 5, 2), (2, 7, 1)]

    def double_w(b):
        import pyarrow as pa_
        return b.set_column(b.schema.get_field_index("w"),
                            "w", pa_.array(b["w"].to_numpy() * 2))

    assert sorted(map_edges(ds, double_w).to_pandas().w) == [2, 2, 2, 4]

    v = rd.from_pandas(pd.DataFrame({"vid": [1, 2], "attr": [10, 20]}))
    got = map_vertices(v, double_w if False else (
        lambda b: b.set_column(b.schema.get_field_index("attr"), "attr",
                               pa.array(b["attr"].to_numpy() + 1)))).to_pandas()
    assert sorted(got.attr) == [11, 21]

    # deterministic + parallelism-invariant pick
    p1 = pick_random_vertex(ds, seed=5)
    p2 = pick_random_vertex(rd.from_pandas(e).repartition(4), seed=5)
    assert p1 == p2 and p1 in {1, 2, 3, 5, 7}
    assert pick_random_vertex(ds, seed=6) in {1, 2, 3, 5, 7}


def test_coreness_matches_networkx():
    import networkx as nx

    from graphx_ray.stages.structural import coreness

    rng = np.random.default_rng(7)
    m = 600
    src = rng.integers(0, 100, m)
    dst = rng.integers(0, 100, m)
    keep = src < dst
    pdf = (
        pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        .drop_duplicates()
        .reset_index(drop=True)
    )
    pdf["w"] = np.int64(1)
    for nblocks in (1, 4):  # parallelism-invariant
        got = (
            coreness(rd.from_pandas(pdf).repartition(nblocks), num_partitions=4)
            .to_pandas()
        )
        g = nx.Graph()
        g.add_edges_from(zip(pdf.src, pdf.dst))
        want = nx.core_number(g)
        assert dict(zip(got.vid, got.core)) == {k: int(v) for k, v in want.items()}


def test_join_vertices(ray_session):
    import ray.data as rd
    from graphx_ray.stages.structural import join_vertices

    verts = pd.DataFrame({"vid": [1, 2, 3, 4], "attr": [10, 20, 30, 40]})
    attrs = pd.DataFrame({"vid": [2, 4], "attr": [99, 77]})
    got = (
        join_vertices(rd.from_pandas(verts), rd.from_pandas(attrs), num_partitions=3)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    # matched vertices updated, unmatched keep their ORIGINAL attr
    assert got.to_dict("list") == {"vid": [1, 2, 3, 4], "attr": [10, 99, 30, 77]}

    # custom vectorized mapFunc: add instead of replace
    def add_fn(batch):
        import pyarrow.compute as pc
        new = pc.coalesce(batch["attr_r"].cast(batch["attr"].type),
                          pa.array(np.zeros(batch.num_rows, np.int64)))
        return pa.table({"vid": batch["vid"], "attr": pc.add(batch["attr"], new)})

    got = (
        join_vertices(rd.from_pandas(verts), rd.from_pandas(attrs), add_fn, num_partitions=3)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    assert got["attr"].tolist() == [10, 119, 30, 117]


def test_collect_edges(ray_session):
    import ray.data as rd
    from graphx_ray.stages.structural import collect_edges

    edges = pd.DataFrame({"src": [1, 1, 2], "dst": [2, 3, 1], "w": [5, 1, 2]})
    for direction, want in (
        ("out", {1: [(1, 2, 5), (1, 3, 1)], 2: [(2, 1, 2)]}),
        ("in", {2: [(1, 2, 5)], 3: [(1, 3, 1)], 1: [(2, 1, 2)]}),
        ("both", {1: [(1, 2, 5), (1, 3, 1), (2, 1, 2)],
                  2: [(1, 2, 5), (2, 1, 2)], 3: [(1, 3, 1)]}),
    ):
        got = collect_edges(rd.from_pandas(edges), direction=direction,
                            num_partitions=3).to_pandas()
        d = {
            int(r.vid): [(e["src"], e["dst"], e["w"]) for e in r.edges]
            for r in got.itertuples()
        }
        assert d == want, direction


def test_csv_json_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    from graphx_ray.sources.io import read_csv, read_json, write_csv, write_json

    df = pd.DataFrame({"src": [1, 2, 3], "dst": [4, 5, 6], "w": [1, 2, 3]})
    cdir, jdir = str(tmp_path / "c"), str(tmp_path / "j")
    write_csv(rd.from_pandas(df).repartition(2), cdir)
    write_json(rd.from_pandas(df).repartition(2), jdir)
    back_c = (
        read_csv(cdir, columns=["src", "w"], schema={"src": pa.int64(), "w": pa.int64()})
        .to_pandas().sort_values("src").reset_index(drop=True)
    )
    assert list(back_c.columns) == ["src", "w"]  # parse-time pruning
    assert back_c["w"].tolist() == [1, 2, 3]
    back_j = read_json(jdir, columns=["dst"]).to_pandas().sort_values("dst")
    assert back_j["dst"].tolist() == [4, 5, 6]


def test_collect_neighbors_with_attrs(ray_session):
    import ray.data as rd
    from graphx_ray.stages.structural import collect_neighbors

    edges = pd.DataFrame({"src": [1, 1, 2, 3], "dst": [2, 3, 3, 1]})
    verts = pd.DataFrame({"vid": [1, 2, 3], "label": [10, 20, 30]})
    got = collect_neighbors(
        rd.from_pandas(edges), rd.from_pandas(verts), direction="out",
        num_partitions=3,
    ).to_pandas()
    d = {int(r.vid): [(e["nbr"], e["label"]) for e in r.neighbors]
         for r in got.itertuples()}
    assert d == {1: [(2, 20), (3, 30)], 2: [(3, 30)], 3: [(1, 10)]}
    got = collect_neighbors(
        rd.from_pandas(edges), rd.from_pandas(verts), direction="both",
        num_partitions=3,
    ).to_pandas()
    d = {int(r.vid): [(e["nbr"], e["label"]) for e in r.neighbors]
         for r in got.itertuples()}
    assert d[3] == [(1, 10), (1, 10), (2, 20)]  # parallel paths kept, sorted


def test_partition_quality_matches_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from graphx_ray.stages.structural import partition_quality

    rng = np.random.default_rng(3)
    edges = pd.DataFrame(
        {"src": rng.integers(0, 40, 200), "dst": rng.integers(0, 40, 200)}
    )
    G = nx.Graph()
    G.add_edges_from(
        (int(a), int(b)) for a, b in zip(edges["src"], edges["dst"]) if a != b
    )
    labels = pd.DataFrame(
        {"vid": sorted(G.nodes), "community": [v % 4 for v in sorted(G.nodes)]}
    )
    got = (
        partition_quality(rd.from_pandas(edges), rd.from_pandas(labels),
                          num_partitions=4)
        .to_pandas().sort_values("community").reset_index(drop=True)
    )
    comm = {c: {v for v in G if v % 4 == c} for c in range(4)}
    m2 = 2 * G.number_of_edges()
    for _, r in got.iterrows():
        C = comm[int(r["community"])]
        vol = sum(G.degree(v) for v in C)
        inside = sum(1 for a, b in G.edges if a in C and b in C)
        cut = nx.cut_size(G, C)
        assert r["n"] == len(C) and r["vol"] == vol
        assert r["in2"] == 2 * inside and r["cut"] == cut
        assert r["vol"] == r["in2"] + r["cut"]
        mn = min(vol, m2 - vol)
        want_cond = (2_000_000 * cut + mn) // (2 * mn) if mn > 0 else -1
        assert r["cond_micro"] == want_cond
    # modularity from the sufficient statistics equals networkx
    q = sum(
        (r["in2"] * m2 - r["vol"] ** 2) for _, r in got.iterrows()
    ) / (m2 * m2)
    want_q = nx.algorithms.community.modularity(
        G, [comm[c] for c in range(4) if comm[c]]
    )
    assert abs(q - want_q) < 1e-12


def test_partition_quality_parallelism_invariant(ray_session):
    import ray.data as rd

    from graphx_ray.stages.structural import partition_quality

    rng = np.random.default_rng(9)
    edges = pd.DataFrame(
        {"src": rng.integers(0, 30, 150), "dst": rng.integers(0, 30, 150)}
    )
    labels = pd.DataFrame({"vid": np.arange(30), "community": np.arange(30) % 3})
    outs = [
        partition_quality(rd.from_pandas(edges).repartition(p),
                          rd.from_pandas(labels), num_partitions=q)
        .to_pandas().sort_values("community").reset_index(drop=True)
        for p, q in ((1, 2), (4, 7))
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
# appended to tests/test_structural.py


def test_sweep_cut_matches_replay(ray_session):
    import ray.data as rd

    from graphx_ray.pipelines.local_cluster import ppr_sweep_cut

    rng = np.random.default_rng(21)
    # two 12-cliques + one bridge: the sweep from inside clique A should
    # bottom out exactly at the clique boundary
    edges = []
    for base in (0, 100):
        for i in range(12):
            for j in range(i + 1, 12):
                edges.append((base + i, base + j))
    edges.append((0, 100))
    extra = rng.integers(0, 12, (30, 2))
    edges += [(int(a), int(b)) for a, b in extra if a != b]
    df = pd.DataFrame(edges, columns=["src", "dst"])

    got = ppr_sweep_cut(rd.from_pandas(df), 0, iters=5, top_t=20,
                        num_partitions=4).to_pandas()

    # independent python replay of the pinned contract
    import collections
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(n) for v, n in adj.items()}
    m2 = sum(deg.values())
    base_mass = (15 * 10**12) // 100
    r = {v: base_mass if v == 0 else 0 for v in adj}
    for _ in range(5):
        nxt = {v: 0 for v in adj}
        for u in adj:
            if r[u]:
                send = (85 * r[u]) // (100 * deg[u])
                for w in adj[u]:
                    nxt[w] += send
        r = nxt
    top = sorted(
        ((v, rv) for v, rv in r.items() if rv > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    order = sorted(top, key=lambda kv: (-(float(kv[1]) / deg[kv[0]]), kv[0]))
    vids = [v for v, _ in order]
    posn = {v: i for i, v in enumerate(vids)}
    vol = win = 0
    seen_pairs = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    rows = []
    for k, v in enumerate(vids, 1):
        vol += deg[v]
        win += sum(
            1 for u in adj[v]
            if u in posn and posn[u] < posn[v]
            and (min(u, v), max(u, v)) in seen_pairs
        )
        cut = vol - 2 * win
        mn = min(vol, m2 - vol)
        cond = (2_000_000 * cut + mn) // (2 * mn) if mn > 0 else -1
        rows.append((k, v, cut, vol, cond))
    want = pd.DataFrame(rows, columns=["k", "vid", "cut", "vol", "cond_micro"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the min-conductance prefix is exactly clique A (12 vertices)
    best_k = int(got.loc[got["cond_micro"].idxmin(), "k"])
    assert best_k == 12
    assert set(got.head(12)["vid"]) == set(range(12))
