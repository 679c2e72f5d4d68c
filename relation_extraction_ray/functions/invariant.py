"""Span-sequence invariant enforcement (BASELINE.json input_hint).

The per-row invariant — equality of the ordered (kind, text, media_ref)
span sequence — must hold through every stage.  Derived tables carry
``span_hash`` (blake2b of the sequence, computed at ingest) instead of the
spans themselves; this module provides:

* :func:`attach_span_hash` — stamp the hash onto a documents Dataset;
* :func:`check_against_documents` — distributed audit: recompute hashes
  from the source documents, broadcast-join them onto any derived table,
  and count mismatches (0 rows = invariant holds);
* :func:`assert_hashes_consistent` — cheap per-table self-check that each
  doc_id maps to exactly one span_hash.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..sources.synth import span_sequence_hash


def _doc_hashes(documents: ray.data.Dataset) -> dict[str, int]:
    out: dict[str, int] = {}
    for b in documents.iter_batches(batch_format="pyarrow"):
        for doc_id, spans in zip(b.column("doc_id").to_pylist(), b.column("spans").to_pylist()):
            spans = spans or []
            out[doc_id] = span_sequence_hash(
                [s["kind"] for s in spans], [s["text"] for s in spans], [s["media_ref"] for s in spans]
            )
    return out


def attach_span_hash(documents: ray.data.Dataset) -> ray.data.Dataset:
    def stamp(batch: pa.Table) -> pa.Table:
        hashes = []
        for spans in batch.column("spans").to_pylist():
            spans = spans or []
            hashes.append(
                span_sequence_hash(
                    [s["kind"] for s in spans], [s["text"] for s in spans], [s["media_ref"] for s in spans]
                )
            )
        return batch.append_column("span_hash", pa.array(hashes, pa.uint64()))

    return documents.map_batches(stamp, batch_format="pyarrow")


def check_against_documents(derived: ray.data.Dataset, documents: ray.data.Dataset) -> int:
    """Number of derived rows whose span_hash disagrees with the source
    document's recomputed hash (0 = invariant preserved).  The doc→hash map
    is broadcast once (small side)."""
    ref = ray.put(_doc_hashes(documents))

    class Check:
        def __init__(self) -> None:
            self.expected = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bad = 0
            for doc_id, h in zip(batch.column("doc_id").to_pylist(), batch.column("span_hash").to_pylist()):
                if self.expected.get(doc_id) != h:
                    bad += 1
            return pa.Table.from_pydict({"bad": pa.array([bad], pa.int64())})

    parts = derived.map_batches(Check, batch_format="pyarrow", concurrency=(1, 4))
    return int(parts.sum("bad") or 0)


def assert_hashes_consistent(derived: ray.data.Dataset) -> None:
    """Each doc_id must map to exactly one span_hash within the table."""

    def partial(batch: pa.Table) -> pa.Table:
        pairs = {
            (d, h)
            for d, h in zip(batch.column("doc_id").to_pylist(), batch.column("span_hash").to_pylist())
        }
        return pa.Table.from_pydict(
            {
                "doc_id": [p[0] for p in pairs],
                "span_hash": pa.array([p[1] for p in pairs], pa.uint64()),
            }
        )

    per_pair = (
        derived.map_batches(partial, batch_format="pyarrow")
        .groupby(["doc_id", "span_hash"])
        .count()
    )
    uniq = per_pair.groupby("doc_id").count()
    counts = [r["count()"] for r in uniq.take_all()]
    if any(c > 1 for c in counts):
        raise AssertionError("span-sequence invariant broken: a doc_id has multiple span hashes")
