"""IO adapter: Lance-first with Parquet fallback (SURVEY.md §7.2).

The target deployment reads/writes Lance tables of interleaved documents;
this sandbox ships pyarrow/parquet only, so every source/sink goes through
this adapter: ``lance`` is used when importable, else the same logical
table lands in partitioned Parquet with identical schemas.  Call sites
never branch on the backend.
"""

from __future__ import annotations

import ray

try:  # pragma: no cover - lance not present in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def backend() -> str:
    return "lance" if HAVE_LANCE else "parquet"


def read_documents(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a documents table (Lance dataset dir or parquet file/dir).
    Column pruning is pushed into the scan either way."""
    if HAVE_LANCE and not path.endswith(".parquet"):  # pragma: no cover
        ds = lance.dataset(path)
        return ray.data.from_arrow_refs(
            [ray.put(batch) for batch in ds.to_batches(columns=columns)]
        )
    return ray.data.read_parquet(path, columns=columns)


def write_jsonl(ds: ray.data.Dataset, path: str) -> None:
    """S4 JSONL sink — the reference's interchange format (one JSON object
    per line, ``wiki2sdp.py:318-328``), for downstream tooling that reads
    line-delimited JSON rather than parquet.  Workers write one ``.json``
    file per block (partitioned layout, never one giant file)."""
    ds.write_json(path)


def read_jsonl(path: str, schema=None) -> ray.data.Dataset:
    """Re-read a JSONL table.  Pass the original Arrow ``schema`` for a
    bit-exact roundtrip — inference would widen int32→int64, float32→
    float64 and lose uint64 precision to doubles."""
    if schema is None:
        return ray.data.read_json(path)
    from pyarrow import json as pj

    return ray.data.read_json(path, parse_options=pj.ParseOptions(explicit_schema=schema))


def write_table(ds: ray.data.Dataset, path: str) -> None:
    """Write a logical table; Lance dataset when available, partitioned
    Parquet otherwise (never one giant file — resumable layout)."""
    if HAVE_LANCE:  # pragma: no cover
        import pyarrow as pa

        tab = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
        lance.write_dataset(tab, path, mode="overwrite")
        return
    ds.write_parquet(path)
