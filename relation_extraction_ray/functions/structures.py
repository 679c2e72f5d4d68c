"""Dep-structure whitelist collection (SURVEY.md J4; the reference ships
``sdp_dep_structures.py`` — one giant set literal of ~1000 dep-label
sequences used by the combined builder's ``is_ok_sdp``,
``wiki_and_semeval2sdp.py:267-293``).

The engine derives the whitelist from data instead of shipping a literal:
count dep-label sequences over an encoded corpus (per-batch partial
combine → tiny groupby) and keep those with support ≥ ``min_count`` —
the same construction the reference's authors ran offline."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import ray


def collect_dep_structures(encoded: ray.data.Dataset, min_count: int = 2) -> set[tuple[str, ...]]:
    """encoded (with ``dep_ids`` decoded or raw) → frequent dep-label-id
    structures.  Works on the ``dep_ids`` column; returns id-tuples ready
    to broadcast into ``is_ok_sdp``-style filters (compare in id space)."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for ids in batch.column("dep_ids").to_pylist():
            c[",".join(map(str, ids))] += 1
        return pa.Table.from_pydict(
            {"s": list(c.keys()), "n": pa.array(list(c.values()), pa.int64())}
        )

    rows = (
        encoded.map_batches(partial, batch_format="pyarrow")
        .groupby("s")
        .sum("n")
        .take_all()
    )
    return {
        tuple(int(x) for x in r["s"].split(",") if x != "")
        for r in rows
        if r["sum(n)"] >= min_count and r["s"] != ""
    }


def dep_structures_as_labels(
    structures: set[tuple[int, ...]], dep_vocab: list[str]
) -> set[tuple[str, ...]]:
    """id-tuples → label-tuples (the form ``KGPipeline(ok_dep_structures=...)``
    accepts; it re-encodes per actor against the broadcast vocab)."""
    return {tuple(dep_vocab[i] for i in s) for s in structures}
