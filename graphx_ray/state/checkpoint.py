"""Per-superstep checkpoint + lineage manifests (SURVEY.md S3/S5).

Layout::

    ckpt_dir/
      iter=000004/part-0.parquet … part-{P-1}.parquet   (written by actors,
                                                         tmp+rename atomic)
      _manifest-000004.json                             (driver, tmp+rename,
                                                         written only after
                                                         every part landed)

A manifest records iteration, algorithm fingerprint (algo + params + P +
edge count), per-partition row counts (lineage) and superstep metrics. A
resume scans for the newest manifest whose fingerprint matches and whose
part files all exist — a kill between part writes and the manifest rename
simply replays that superstep, which is safe because supersteps never
mutate a previous iteration's files.
"""

from __future__ import annotations

import glob
import json
import os
import re


def iter_dir(ckpt_dir: str, it: int) -> str:
    return os.path.join(ckpt_dir, f"iter={it:06d}")


def part_path(ckpt_dir: str, it: int, part: int) -> str:
    return os.path.join(iter_dir(ckpt_dir, it), f"part-{part}.parquet")


def write_manifest(ckpt_dir: str, it: int, fingerprint: dict, parts: dict, metrics: dict) -> None:
    path = os.path.join(ckpt_dir, f"_manifest-{it:06d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"iteration": it, "fingerprint": fingerprint, "parts": parts, "metrics": metrics},
            f,
        )
    os.replace(tmp, path)


def latest_complete(ckpt_dir: str, fingerprint: dict) -> int | None:
    """Newest iteration with a matching manifest and all part files present."""
    best = None
    for p in sorted(glob.glob(os.path.join(ckpt_dir, "_manifest-*.json")), reverse=True):
        m = re.search(r"_manifest-(\d+)\.json$", p)
        if not m:
            continue
        it = int(m.group(1))
        try:
            with open(p) as f:
                man = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if man.get("fingerprint") != fingerprint:
            continue
        parts = man.get("parts", {})
        if all(os.path.exists(part_path(ckpt_dir, it, int(k))) for k in parts):
            best = it
            break
    return best


def manifest_metrics(ckpt_dir: str, it: int) -> dict:
    """Metrics dict of one iteration's manifest ({} if unreadable) — lets
    a resume recognize an already-converged run (metrics.changed == 0)."""
    path = os.path.join(ckpt_dir, f"_manifest-{it:06d}.json")
    try:
        with open(path) as f:
            return json.load(f).get("metrics", {}) or {}
    except (OSError, json.JSONDecodeError):
        return {}


def append_metrics(workdir: str, record: dict) -> None:
    with open(os.path.join(workdir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
