"""Fixed Arrow schemas for every logical table (SURVEY.md §7.1).

The reference's schema is implicit dict-key convention + arity sniffing
(``data_handler.py:326-372``); this engine validates fixed ``pyarrow``
schemas at stage boundaries instead.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# input_hint shape: interleaved text + media documents
DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

TOKEN_STRUCT = pa.struct(
    [
        ("text", pa.string()),
        ("idx", pa.int32()),
        ("pos", pa.string()),
        ("dep", pa.string()),
        ("head", pa.int32()),
        ("is_punct", pa.bool_()),
        ("like_num", pa.bool_()),
    ]
)

SENTENCES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("sent_id", pa.int32()),
        ("text", pa.string()),
        ("tokens", pa.list_(TOKEN_STRUCT)),
        ("span_hash", pa.uint64()),  # span-sequence invariant carrier
    ]
)

PATH_STRUCT = pa.struct(
    [
        ("word", pa.string()),
        ("dep", pa.string()),
        ("pos", pa.string()),
    ]
)

SDP_RECORDS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("sent_id", pa.int32()),
        ("pair_id", pa.int32()),
        ("path", pa.list_(PATH_STRUCT)),
        ("subj", pa.string()),
        ("obj", pa.string()),
        ("source", pa.string()),
        ("span_hash", pa.uint64()),
    ]
)

ENCODED = pa.schema(
    [
        ("doc_id", pa.string()),
        ("sent_id", pa.int32()),
        ("pair_id", pa.int32()),
        ("path_words", pa.list_(pa.string())),
        ("word_ids", pa.list_(pa.int32())),
        ("dep_ids", pa.list_(pa.int32())),
        ("pos_ids", pa.list_(pa.int32())),
        ("target_ids", pa.list_(pa.int32())),
        ("length", pa.int32()),
        ("subj", pa.string()),
        ("obj", pa.string()),
        ("verdict", pa.string()),  # 'GOOD' | 'BAD' audit column (S5)
        ("span_hash", pa.uint64()),
    ]
)

TRIPLES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("sent_id", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("score", pa.float32()),
        ("span_hash", pa.uint64()),
    ]
)

ENTITIES = pa.schema(
    [
        ("canonical_id", pa.string()),
        ("surface", pa.string()),  # most frequent raw variant
        ("norm", pa.string()),
        ("count", pa.int64()),
    ]
)

ADJACENCY = pa.schema(
    [
        ("src_id", pa.string()),
        ("pred", pa.string()),
        ("dst_id", pa.string()),
        ("weight", pa.int64()),
        ("doc_count", pa.int64()),
        ("sample_doc_id", pa.string()),
    ]
)

VOCAB = pa.schema(
    [
        ("id", pa.int32()),
        ("token", pa.string()),
        ("prob", pa.float64()),
    ]
)

GOLD_TRIPLES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("sent_id", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, stage: str) -> pa.Table:
    """Assert-cast a batch to a stage's declared schema (order-insensitive)."""
    got = {f.name: f.type for f in table.schema}
    want = {f.name: f.type for f in schema}
    missing = [n for n in want if n not in got]
    if missing:
        raise ValueError(f"stage {stage}: missing columns {missing}; have {list(got)}")
    cols = [table.column(n).cast(want[n]) for n in want]
    return pa.Table.from_arrays(cols, names=list(want))
