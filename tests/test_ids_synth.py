import numpy as np
import pyarrow.compute as pc

from graphx_ray import schemas
from graphx_ray.ids import collision_audit, hash_text64, part_of, vid_for
from graphx_ray.sources.synth import gen_transcript_shard, gen_transcripts_local


def test_vid_deterministic_and_kind_scoped():
    a = vid_for("conv", ["c1", "c2", "c1"])
    b = vid_for("conv", ["c1", "c2", "c1"])
    assert np.array_equal(a, b)
    assert a[0] == a[2] and a[0] != a[1]
    # same key, different kind → different vertex
    assert vid_for("tool", ["c1"])[0] != a[0]
    assert (a >= 0).all()
    collision_audit(a, ["c1", "c2", "c1"])


def test_hash_text64_stable():
    h1 = hash_text64(["abc", "", "emoji 🙂\nnewline"])
    h2 = hash_text64(["abc", "", "emoji 🙂\nnewline"])
    assert np.array_equal(h1, h2)
    assert h1.dtype == np.uint64


def test_part_of_spreads():
    vids = vid_for("conv", [f"c{i}" for i in range(1000)])
    parts = part_of(vids, 8)
    counts = np.bincount(parts, minlength=8)
    assert counts.min() > 60  # roughly uniform
    # small sequential ints also spread (splitmix64 finalizer)
    parts2 = part_of(np.arange(1000), 8)
    assert np.bincount(parts2, minlength=8).min() > 60


def test_generator_contract():
    t = gen_transcripts_local(200, seed=42)
    assert t.schema.equals(schemas.TRANSCRIPTS)
    df = t.to_pandas()
    g = df.groupby("conv_id")
    # dense unique turn_idx from 0; strictly increasing ts within conv
    for _, grp in list(g)[:20]:
        assert list(grp["turn_idx"]) == list(range(len(grp)))
        assert grp["ts"].is_monotonic_increasing
    assert df["tool"].notna().mean() > 0.1
    assert set(df["role"]) <= {"user", "assistant", "system", "tool"}
    # determinism: regeneration is bit-identical
    t2 = gen_transcripts_local(200, seed=42)
    assert t.equals(t2)
    # sharding is seed-stable: shard 1 differs from shard 0
    s1 = gen_transcript_shard(1, 100, 100, seed=42)
    assert not s1.equals(gen_transcript_shard(0, 100, 0, seed=42))


def test_generator_text_nontrivial():
    t = gen_transcripts_local(50, seed=7)
    texts = t["text"].to_pylist()
    assert any("\n" in s for s in texts) or any("🙂" in s or "🚀" in s for s in texts)
    assert len(set(texts)) > 40


def test_generator_distributed_matches_local():
    from graphx_ray.sources.synth import transcripts_dataset

    ds = transcripts_dataset(120, seed=42, shard_convs=50)
    got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # local single-shard generation of the same convs, shard-wise
    import pandas as pd

    parts = [
        gen_transcript_shard(0, 50, 0, seed=42).to_pandas(),
        gen_transcript_shard(1, 50, 50, seed=42).to_pandas(),
        gen_transcript_shard(2, 20, 100, seed=42).to_pandas(),
    ]
    want = (
        pd.concat(parts).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_fnv1a64_words_matches_scalar_and_is_width_invariant():
    """fnv1a64_words: equal words hash equal regardless of the batch's max
    word width (UCS4 matrix padding), matches the scalar FNV-1a-64 over
    codepoints, and is reproducible in SQL (the dedup-oracle contract)."""
    import numpy as np

    from graphx_ray.ids import fnv1a64_words

    def scalar(w: str) -> int:
        h = 14695981039346656037
        for c in w:
            h = ((h ^ ord(c)) * 1099511628211) % (1 << 64)
        return h

    words = ["a", "hello", "zz", "", "longerwordhere", "hello"]
    got = fnv1a64_words(np.array(words, dtype=object))
    assert [int(x) for x in got] == [scalar(w) for w in words]
    # width invariance: same words inside a batch with a much longer word
    got2 = fnv1a64_words(np.array(words + ["x" * 60], dtype=object))
    assert (got2[: len(words)] == got).all()
    # DuckDB recomputes the same hash (recursive char fold, HUGEINT)
    import duckdb

    q = """
    WITH RECURSIVE f AS (
        SELECT 'hello' AS w, 1 AS j, 14695981039346656037::HUGEINT AS h
        UNION ALL
        SELECT w, j + 1,
               (xor(h, ord(substr(w, j, 1))::HUGEINT) * 1099511628211)
               % 18446744073709551616
        FROM f WHERE j <= length(w)
    )
    SELECT h FROM f WHERE j = length(w) + 1
    """
    assert int(duckdb.sql(q).fetchall()[0][0]) == scalar("hello")


def test_fnv1a64_words_empty():
    import numpy as np

    from graphx_ray.ids import fnv1a64_words

    assert len(fnv1a64_words(np.array([], dtype=object))) == 0


def test_graph_generators():
    """GraphX GraphGenerators parity: closed-form star/grid, deterministic
    skewed R-MAT, log-normal out-degrees with in-range destinations."""
    import numpy as np
    import ray.data  # noqa: F401

    from graphx_ray.sources.generators import (
        grid_graph,
        log_normal_graph,
        rmat_graph,
        star_graph,
    )

    s = star_graph(8).to_pandas()
    assert sorted(zip(s.src, s.dst)) == [(i, 0) for i in range(1, 8)]

    g = grid_graph(3, 4).to_pandas()
    assert len(g) == 3 * 3 + 2 * 4  # right edges + down edges
    assert ((g.dst - g.src == 1) | (g.dst - g.src == 4)).all()

    r1 = rmat_graph(6, 2000, seed=9).to_pandas()
    r2 = rmat_graph(6, 2000, seed=9).to_pandas()
    assert len(r1) == 2000
    assert sorted(zip(r1.src, r1.dst)) == sorted(zip(r2.src, r2.dst))
    assert (r1.src < 64).all() and (r1.dst < 64).all()
    # a=0.45 skews mass toward low ids: vertex 0 must dominate
    assert r1.src.value_counts().idxmax() == 0

    ln = log_normal_graph(300, mu=1.0, sigma=0.8, seed=17).to_pandas()
    assert ((ln.dst >= 0) & (ln.dst < 300)).all()
    mean_deg = len(ln) / 300
    # E[exp(mu + sigma Z)] = exp(mu + sigma^2/2) ≈ 3.74; floor+cap pulls it down
    assert 1.5 < mean_deg < 3.74


def test_load_edge_list(tmp_path):
    from graphx_ray.sources.generators import load_edge_list

    p = tmp_path / "edges.txt"
    p.write_text(
        "# comment line\n"
        "1 2\n"
        "3\t4\n"
        "\n"
        "5 2 ignored-extra\n"
        "9 7\n"
    )
    got = load_edge_list(str(p)).to_pandas()
    assert sorted(zip(got.src, got.dst)) == [(1, 2), (3, 4), (5, 2), (9, 7)]
    assert (got.w == 1).all()
    canon = load_edge_list(str(p), canonical=True).to_pandas()
    assert sorted(zip(canon.src, canon.dst)) == [(1, 2), (2, 5), (3, 4), (7, 9)]
