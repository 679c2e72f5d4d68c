"""Skew-safe aggregation utilities (SURVEY.md §4, north-rule skew handling).

Two complementary tools against Zipf-skewed keys (head entities):

* :func:`combine_then_groupby_sum` — the default everywhere in this engine:
  per-batch partial combine bounds shuffled rows by distinct-keys-per-batch,
  so a key holding 20% of all rows still ships ONE row per batch.
* :func:`salted_groupby_sum` — the classic two-phase salted aggregate for
  cases where the per-group STATE (not just the row count) is heavy:
  ``key → (key, salt)`` with ``salt = hash(row) % S`` splits a hot group
  across S reducers, a second tiny groupby unsalts.  Provided as the
  explicit, documented fallback and exercised by the Zipf skew test.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow as pa
import ray


def combine_then_groupby_sum(
    ds: ray.data.Dataset, key_col: str, value_col: str | None = None
) -> ray.data.Dataset:
    """groupby(key).sum-or-count with a per-batch combiner.  Output columns:
    (key_col, total)."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist() if value_col else [1] * len(keys)
        for k, v in zip(keys, vals):
            c[k] += v
        return pa.Table.from_pydict(
            {key_col: list(c.keys()), "total": pa.array(list(c.values()), pa.int64())}
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby(key_col).sum("total")
    return out.map_batches(
        lambda t: t.rename_columns([key_col, "total"]), batch_format="pyarrow"
    )


def salted_groupby_sum(
    ds: ray.data.Dataset, key_col: str, value_col: str | None = None, n_salts: int = 16
) -> ray.data.Dataset:
    """Two-phase salted aggregate: phase 1 groups on (key, salt) — a hot key
    spreads over ``n_salts`` reducers; phase 2 unsalts with a tiny groupby.
    Output columns: (key_col, total)."""

    def add_salt(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist() if value_col else [1] * batch.num_rows
        salts = [
            int.from_bytes(hashlib.blake2b(f"{i}:{k}".encode(), digest_size=4).digest(), "big")
            % n_salts
            for i, k in enumerate(keys)
        ]
        return pa.Table.from_pydict(
            {
                key_col: keys,
                "salt": pa.array(salts, pa.int32()),
                "v": pa.array(vals, pa.int64()),
            }
        )

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key_col, "salt"])
        .sum("v")
    )

    def drop_salt(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {key_col: batch.column(key_col), "v": batch.column("sum(v)").cast(pa.int64())}
        )

    phase2 = phase1.map_batches(drop_salt, batch_format="pyarrow").groupby(key_col).sum("v")
    return phase2.map_batches(
        lambda t: t.rename_columns([key_col, "total"]), batch_format="pyarrow"
    )
