import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graphx_ray import schemas
from graphx_ray.ids import vid_for
from graphx_ray.sources.synth import gen_transcripts_local
from graphx_ray.stages.derive import (
    build_graph,
    canonical_edges,
    conv_starts,
    degrees,
    reply_tool_edges,
    zone_edges,
)

ZONE_W, DELTA = 3600, 900


@pytest.fixture(scope="module")
def tx():
    return gen_transcripts_local(300, seed=42, n_hours=12)  # dense hours → zone pairs


@pytest.fixture(scope="module")
def tx_ds(tx):
    return rd.from_arrow(tx)


def oracle_edges(tx: pa.Table) -> pd.DataFrame:
    df = tx.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rows = []
    for conv, g in df.groupby("conv_id"):
        roles = g["role"].to_numpy()
        turns = g["turn_idx"].to_numpy()
        for i in range(len(g) - 1):
            if turns[i] + 1 == turns[i + 1]:
                rows.append(
                    (vid_for("actor", [roles[i]])[0], vid_for("actor", [roles[i + 1]])[0], "reply")
                )
        for t in g["tool"].dropna():
            rows.append((vid_for("conv", [conv])[0], vid_for("tool", [t])[0], "tool"))
    # zone pairs
    starts = df.groupby("conv_id")["ts"].min().astype("int64") // 1  # ns? pandas ts
    starts_us = df.groupby("conv_id")["ts"].min().map(lambda t: t.value // 1000)
    convs = starts_us.index.to_numpy()
    svals = starts_us.to_numpy()
    vids = vid_for("conv", convs)
    zones = svals // (ZONE_W * 1_000_000)
    for i in range(len(convs)):
        for j in range(i + 1, len(convs)):
            if abs(int(svals[i]) - int(svals[j])) <= DELTA * 1_000_000 and abs(
                int(zones[i]) - int(zones[j])
            ) <= 1:
                u, v = sorted((vids[i], vids[j]))
                if u != v:
                    rows.append((u, v, "zone"))
    e = pd.DataFrame(rows, columns=["src", "dst", "etype"])
    return (
        e.groupby(["src", "dst", "etype"], as_index=False)
        .size()
        .rename(columns={"size": "w"})
        .astype({"src": "int64", "dst": "int64", "w": "int64"})
    )


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_build_graph_matches_oracle(tx, tx_ds):
    want = oracle_edges(tx)
    verts, edges = build_graph(tx_ds, zone_width_s=ZONE_W, delta_s=DELTA, num_partitions=4)
    got = edges.to_pandas()
    pd.testing.assert_frame_equal(normalize(got), normalize(want), check_dtype=False)

    vdf = verts.to_pandas()
    assert set(vdf["kind"]) == {"conv", "tool", "actor"}
    assert vdf["vid"].is_unique
    assert (vdf[vdf.kind == "conv"]["key"].sort_values().to_numpy() ==
            np.sort(tx.to_pandas()["conv_id"].unique())).all()
    # zone pairs genuinely exist in this fixture
    assert (got["etype"] == "zone").sum() > 0
    assert (got["etype"] == "reply").sum() > 0
    assert (got[got.etype == "reply"]["w"] > 1).any()  # multiplicity collapsed


def test_zone_pairs_exactly_once(tx_ds):
    # pairs must be unique even across the border-duplication trick
    starts = conv_starts(tx_ds)
    ze = zone_edges(starts, zone_width_s=ZONE_W, delta_s=DELTA, num_partitions=3)
    df = ze.to_pandas()
    assert not df.duplicated(subset=["src", "dst"]).any()
    assert (df["src"] < df["dst"]).all()


def test_zone_pairs_slice_invariant(tx_ds):
    # skew slicing (many tiny expansion tasks) must emit the EXACT same
    # pair multiset as one slice per partition
    starts = conv_starts(tx_ds)
    one = zone_edges(starts, zone_width_s=ZONE_W, delta_s=DELTA, num_partitions=3)
    sliced = zone_edges(
        starts, zone_width_s=ZONE_W, delta_s=DELTA, num_partitions=3,
        max_pairs_per_task=7,
    )
    a = one.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = sliced.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 7  # the tiny cap actually forced multiple slices


def test_degrees_and_canonical(tx_ds):
    _, edges = build_graph(tx_ds, num_partitions=4)
    e = edges.to_pandas()
    deg = degrees(edges).to_pandas()
    out_w = e.groupby("src")["w"].sum()
    in_w = e.groupby("dst")["w"].sum()
    want = pd.DataFrame({"in_deg": in_w, "out_deg": out_w}).fillna(0).astype("int64")
    want["deg"] = want.in_deg + want.out_deg
    want = want.rename_axis("vid").reset_index()
    pd.testing.assert_frame_equal(
        normalize(deg[["vid", "in_deg", "out_deg", "deg"]]), normalize(want), check_dtype=False
    )

    canon = canonical_edges(edges).to_pandas()
    want_c = e.assign(u=np.minimum(e.src, e.dst), v=np.maximum(e.src, e.dst))
    want_c = want_c[want_c.u != want_c.v][["u", "v"]].drop_duplicates()
    pd.testing.assert_frame_equal(normalize(canon), normalize(want_c), check_dtype=False)


def test_text_roundtrip_byte_equality(tx):
    """BASELINE.json:15 invariant: per-turn text byte-equal under stable
    (conv_id, turn_idx) order after a shuffle."""
    ds = rd.from_arrow(tx)
    shuffled = (
        ds.repartition(5, keys=["conv_id"])
        .map_batches(lambda b: b, batch_format="pyarrow", zero_copy_batch=True)
    )
    got = shuffled.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = tx.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()
    assert got["text"].map(lambda s: s.encode()).equals(want["text"].map(lambda s: s.encode()))


def test_empty_transcripts():
    empty = schemas.TRANSCRIPTS.empty_table()
    verts, edges = build_graph(rd.from_arrow(empty), num_partitions=2)
    assert edges.count() == 0
    assert verts.count() == 0


def test_grouped_top_k(ray_session):
    import ray.data as rd

    from graphx_ray.stages.derive import grouped_top_k

    rng = np.random.default_rng(12)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, n),
            "v": rng.integers(0, 100, n).astype(float),
            "t1": rng.integers(0, 1000, n),
            "t2": np.arange(n),  # uniqueness
        }
    )
    for nblocks in (1, 6):
        got = (
            grouped_top_k(
                rd.from_pandas(df).repartition(nblocks), ["g"], "v", 5,
                tie_cols=["t1", "t2"], num_partitions=4,
            )
            .to_pandas()
            .sort_values(["g", "v", "t1", "t2"], ascending=[True, False, True, True])
            .reset_index(drop=True)
        )
        want = (
            df.sort_values(["v", "t1", "t2"], ascending=[False, True, True])
            .groupby("g").head(5)
            .sort_values(["g", "v", "t1", "t2"], ascending=[True, False, True, True])
            .reset_index(drop=True)[got.columns.tolist()]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_in_out_degrees(ray_session):
    import ray.data as rd

    from graphx_ray.stages.derive import in_degrees, out_degrees

    edges = pd.DataFrame({"src": [1, 1, 2], "dst": [2, 3, 3], "w": [1, 2, 1]})
    ind = in_degrees(rd.from_pandas(edges), num_partitions=2).to_pandas().set_index("vid")
    outd = out_degrees(rd.from_pandas(edges), num_partitions=2).to_pandas().set_index("vid")
    assert ind["in_deg"].to_dict() == {2: 1, 3: 3}
    assert outd["out_deg"].to_dict() == {1: 3, 2: 1}


def test_grouped_top_k_unsigned_and_nan(ray_session):
    """ADVICE r3: a bare -v lexsort key wraps unsigned ints (0 lands in the
    largest value's slot) and leaves NaN floats unpinned — _desc_key must
    give exact descending order for uint64 extremes and rank NaN last."""
    import ray.data as rd

    from graphx_ray.stages.derive import grouped_top_k

    # uint64 spanning the overflow-prone extremes
    t = pa.table(
        {
            "g": pa.array([0, 0, 0, 0], type=pa.int64()),
            "v": pa.array([0, 5, 2**63, 2**64 - 1], type=pa.uint64()),
            "t1": pa.array([0, 1, 2, 3], type=pa.int64()),
        }
    )
    got = (
        grouped_top_k(rd.from_arrow(t), ["g"], "v", 2, tie_cols=["t1"], num_partitions=2)
        .to_pandas().sort_values("v", ascending=False).reset_index(drop=True)
    )
    assert got["v"].tolist() == [2**64 - 1, 2**63]

    # NaN floats rank LAST (never displace real values from the top-k)
    t2 = pa.table(
        {
            "g": pa.array([0, 0, 0], type=pa.int64()),
            "v": pa.array([float("nan"), 1.0, 2.0], type=pa.float64()),
            "t1": pa.array([0, 1, 2], type=pa.int64()),
        }
    )
    got2 = (
        grouped_top_k(rd.from_arrow(t2), ["g"], "v", 2, tie_cols=["t1"], num_partitions=2)
        .to_pandas().sort_values("v", ascending=False).reset_index(drop=True)
    )
    assert got2["v"].tolist() == [2.0, 1.0]
