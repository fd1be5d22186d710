"""End-to-end CLI drive: gen → build-graph → run-algo inside the test
session's Ray (the CLI's own ray.init/shutdown are a no-op/patched here —
its `if not ray.is_initialized()` guard skips init, and shutdown is
patched so it cannot tear down the session fixture)."""

import json
import os

import pyarrow.parquet as pq


def test_cli_gen_build_run(tmp_path, monkeypatch, capsys):
    import ray

    from graphx_ray import cli

    monkeypatch.setattr(ray, "shutdown", lambda: None)
    tx = str(tmp_path / "tx")
    gdir = str(tmp_path / "g")

    assert cli.main(["gen", "--out", tx, "--convs", "60", "--hours", "4"]) == 0
    assert any(f.endswith(".parquet") for f in os.listdir(tx))

    assert (
        cli.main(
            ["build-graph", "--input", tx, "--out", gdir, "--parts", "2", "--delta", "60"]
        )
        == 0
    )
    edges = pq.read_table(f"{gdir}/edges")
    assert edges.num_rows > 0 and {"src", "dst", "w"} <= set(edges.column_names)

    out = str(tmp_path / "pr")
    assert (
        cli.main(
            ["run-algo", "pagerank", "--edges", f"{gdir}/edges", "--out", out,
             "--parts", "2", "--max-iter", "3"]
        )
        == 0
    )
    line = [l for l in capsys.readouterr().out.splitlines() if '"pagerank"' in l][-1]
    rec = json.loads(line)
    assert rec["rows"] > 0
    ranks = pq.read_table(f"{out}/part-0.parquet")
    assert {"vid", "rank"} <= set(ranks.column_names)
