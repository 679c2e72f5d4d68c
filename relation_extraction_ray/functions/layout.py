"""Storage-layout operators: Z-order (Morton) clustering + zone maps.

At 100 TB the cheapest scan is the one never issued: engines prune
parquet row groups with footer min/max statistics ("zone maps"), and
how much those statistics prune depends entirely on the WRITE LAYOUT.
A table sorted by one key prunes that key only; interleaving the bits
of two normalized keys into a Morton (Z-order) code and sorting by it
gives every bucket a small min/max RECTANGLE in (x, y) space, so 2-d
box predicates skip most buckets — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Two operators:

- :func:`zorder_key` — append the Morton code + bucket id to each row
  (one streaming scan after a tiny global min/max pass).  A z-ordered
  rewrite is then just ``.sort("z").write_parquet(...)`` (or a bucket-
  partitioned write); the code column is exact integer math, so the
  layout is reproducible and SQL-replayable.
- :func:`zorder_zonemaps` — the layout-quality diagnostic: per-bucket
  zone maps (row count + min/max of both columns).  Per-batch Arrow
  partials fold to ≤ n_buckets rows before the one aggregate-sized
  groupby, so nothing fact-sized crosses the exchange.

Normalization: each column is affinely mapped to ``[0, 2^bits)`` with
integer arithmetic — ``(v - min) * (2^bits - 1) // max(range, 1)`` —
off a first min/max pass (one tiny aggregate; at a lake scale those
bounds come from table metadata for free).  Bit interleave uses the
classic parallel-prefix spread on uint64 (vectorized numpy; the SQL
oracle replays it as a sum over ``unnest(range(bits))`` bit gathers).

Reference: no counterpart (the reference never touches storage
layout); engine addition per the 100-TB mandate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_SPREAD_MASKS = (
    (16, np.uint64(0x0000FFFF0000FFFF)),
    (8, np.uint64(0x00FF00FF00FF00FF)),
    (4, np.uint64(0x0F0F0F0F0F0F0F0F)),
    (2, np.uint64(0x3333333333333333)),
    (1, np.uint64(0x5555555555555555)),
)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 to the even bit positions."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    for shift, mask in _SPREAD_MASKS:
        v = (v | (v << np.uint64(shift))) & mask
    return v


def morton_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton code: x's bits on even positions, y's on odd."""
    return _part1by1(x) | (_part1by1(y) << np.uint64(1))


def _scale(v: np.ndarray, lo: int, hi: int, bits: int) -> np.ndarray:
    """Exact-integer affine map of [lo, hi] onto [0, 2^bits)."""
    rng = max(int(hi) - int(lo), 1)
    return ((v.astype(np.int64) - np.int64(lo)) * np.int64((1 << bits) - 1) // rng).astype(
        np.uint64
    )


def _minmax(ds: ray.data.Dataset, col_x: str, col_y: str) -> tuple[int, int, int, int]:
    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(
        *[
            agg(c, alias_name=f"{which}_{c}")
            for c in (col_x, col_y)
            for which, agg in (("min", Min), ("max", Max))
        ]
    )
    return (
        int(stats[f"min_{col_x}"]),
        int(stats[f"max_{col_x}"]),
        int(stats[f"min_{col_y}"]),
        int(stats[f"max_{col_y}"]),
    )


def zorder_key(
    ds: ray.data.Dataset,
    col_x: str,
    col_y: str,
    bits: int = 16,
    n_bucket_bits: int = 6,
    bounds: tuple[int, int, int, int] | None = None,
) -> ray.data.Dataset:
    """Append ``z`` (Morton code of the normalized columns, int64) and
    ``bucket`` (its top ``n_bucket_bits`` — the write-partition id) to
    every row.  ``bounds=(min_x, max_x, min_y, max_y)`` skips the
    min/max pass when the caller already has table statistics."""
    lo_x, hi_x, lo_y, hi_y = bounds if bounds is not None else _minmax(ds, col_x, col_y)
    shift = 2 * bits - n_bucket_bits

    def add_z(batch: pa.Table) -> pa.Table:
        x = batch.column(col_x).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(col_y).to_numpy(zero_copy_only=False).astype(np.int64)
        z = morton_interleave(
            _scale(x, lo_x, hi_x, bits), _scale(y, lo_y, hi_y, bits)
        )
        return batch.append_column("z", pa.array(z.astype(np.int64))).append_column(
            "bucket", pa.array((z >> np.uint64(shift)).astype(np.int64))
        )

    return ds.map_batches(add_z, batch_format="pyarrow")


def zorder_zonemaps(
    ds: ray.data.Dataset,
    col_x: str,
    col_y: str,
    bits: int = 16,
    n_bucket_bits: int = 6,
) -> ray.data.Dataset:
    """Per-bucket zone maps of the z-ordered layout: (bucket, n, min/max
    of both columns) — what a parquet reader would prune on after a
    ``ZORDER BY (col_x, col_y)`` rewrite.  Output ≤ 2^n_bucket_bits rows."""
    from ray.data.aggregate import Max, Min, Sum

    keyed = zorder_key(ds.select_columns([col_x, col_y]), col_x, col_y, bits, n_bucket_bits)

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "bucket": batch.column("bucket"),
                    "x": batch.column(col_x).cast(pa.int64()),
                    "y": batch.column(col_y).cast(pa.int64()),
                }
            )
            .group_by("bucket")
            .aggregate(
                [("x", "count"), ("x", "min"), ("x", "max"), ("y", "min"), ("y", "max")]
            )
        )
        return pa.table(
            {
                "bucket": g.column("bucket"),
                "n": g.column("x_count").cast(pa.int64()),
                "min_x": g.column("x_min"),
                "max_x": g.column("x_max"),
                "min_y": g.column("y_min"),
                "max_y": g.column("y_max"),
            }
        )

    return (
        keyed.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("min_x", alias_name="min_x"),
            Max("max_x", alias_name="max_x"),
            Min("min_y", alias_name="min_y"),
            Max("max_y", alias_name="max_y"),
        )
        .sort("bucket")
    )


def zonemap_prune_fraction(
    zonemaps: "pa.Table | list[dict]",
    box: tuple[int, int, int, int],
) -> float:
    """Fraction of buckets a (x BETWEEN a AND b, y BETWEEN c AND d) scan
    must read given the zone maps — the layout-quality number."""
    if isinstance(zonemaps, pa.Table):
        rows = zonemaps.to_pylist()
    else:
        rows = list(zonemaps)
    a, b, c, d = box
    hit = sum(
        1
        for r in rows
        if r["min_x"] <= b and r["max_x"] >= a and r["min_y"] <= d and r["max_y"] >= c
    )
    return hit / max(len(rows), 1)
