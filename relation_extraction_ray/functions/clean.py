"""End-to-end corpus cleaning recipe: quality gates + language filter +
exact keep-first dedup, composed as ONE streaming pipeline.

This is the composition a MassiveText/C4-style training-data pipeline
runs as its outer loop (quality screens → language selection → exact
dedup); each piece exists as a standalone oracle-checked operator
(``text.quality_features``, ``text.LangIdStage``, ``dedup.exact_dedup``)
— this module fuses the per-doc screens into one scan so a 100-TB input
is read ONCE, and only the survivors' (doc_id, md5) pairs reach the
single dedup exchange.

Scale shape: stage 1 is an embarrassingly parallel map (quality metrics,
language ID and the md5 fingerprint all computed vectorized per batch;
gated rows dropped before the shuffle); stage 2 is one hash-partitioned
exchange on the md5 key where each partition keeps the min-doc_id row
per hash.  Shuffled volume = surviving rows × ~50 bytes, never the text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .text import LangIdStage, _split_lower


class CleanStage:
    """Fused per-doc screen: quality metrics + language ID + md5, gates
    applied in-batch (task-cached stage; marker matrix built once)."""

    def __init__(self, min_tokens: int, max_token_len: int, lang: str) -> None:
        self.lang_stage = LangIdStage()
        self.min_tokens = min_tokens
        self.max_token_len = max_token_len
        self.lang = lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        split = _split_lower(batch.column("text"))
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(lens)
        flat = pc.list_flatten(split)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        max_len = np.zeros(n, np.int64)
        np.maximum.at(max_len, row, tok_len)
        lang_pred = self.lang_stage(batch).column("lang_pred").to_numpy(zero_copy_only=False)
        keep = (lens >= self.min_tokens) & (max_len <= self.max_token_len) & (
            lang_pred == self.lang
        )
        kept = batch.filter(pa.array(keep))
        # md5 must match SQL md5(text): no vectorized Arrow kernel exists —
        # per-row hashlib over the SURVIVORS only (post-gate, bounded)
        h = [hashlib.md5(t.encode()).hexdigest() for t in kept.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "h": pa.array(h, pa.string()),
                "n_tokens": pa.array(lens[keep]),
                "lang_pred": pa.array(lang_pred[keep].astype(object), pa.string()),
            }
        )


def clean_corpus(
    docs: ray.data.Dataset,
    min_tokens: int = 5,
    max_token_len: int = 30,
    lang: str = "en",
) -> ray.data.Dataset:
    """Cleaned corpus: per-doc quality + language gates fused into one
    scan, then exact keep-first (min doc_id) dedup on md5(text) via one
    hash-partitioned exchange.  Returns (doc_id, n_tokens, lang_pred)
    of the keepers, sorted by doc_id."""
    from ..taskexec import cached_stage_fn
    from .joins import derive_n_parts, hash_partitioned_groups

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("lang_pred", pa.string())]
    )

    screened = docs.map_batches(
        cached_stage_fn(
            CleanStage,
            (min_tokens, max_token_len, lang),
            {"min_tokens": min_tokens, "max_token_len": max_token_len, "lang": lang},
        ),
        batch_format="pyarrow",
    )

    def keep_first(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        t = part.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        hh = t.column("h").to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], hh[1:] != hh[:-1]])
        k = t.filter(pa.array(first))
        return pa.table(
            {
                "doc_id": k.column("doc_id"),
                "n_tokens": k.column("n_tokens"),
                "lang_pred": k.column("lang_pred"),
            }
        )

    n_parts = derive_n_parts(docs.count(), rows_per_part=65536)
    return hash_partitioned_groups(screened, ["h"], keep_first, n_parts).sort("doc_id")


def delta_dedup(
    base: ray.data.Dataset, delta: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Incremental-ingest dedup: given a BASE corpus already in the lake
    and a new DELTA batch, keep only delta documents whose content is
    (a) not already in the base and (b) unique within the delta (exact
    keep-first by min doc_id).  This is the nightly-crawl-append shape:
    the base is summarized ONCE into an 8 KiB mergeable Bloom sketch
    (``sketch.bloom_sketch`` — no false negatives, so nothing new is
    ever wrongly dropped), and each delta batch probes the broadcast
    sketch in one shuffle-free pass; only the *survivors'*
    (md5-fingerprint, doc_id) pairs reach the single within-delta dedup
    exchange.

    Because every Bloom bit is md5-derived, the sketch's false positives
    — delta docs dropped as "probably in base" without being there — are
    DETERMINISTIC and SQL-replayable, so the whole operator has an exact
    cross-engine oracle (the persisted-base scale path: keep per-shard
    sketches and OR-merge, 8 KiB each regardless of shard size).
    Output: (doc_id, fp) of kept delta docs.  Base text never crosses
    the exchange; delta text never leaves its batch."""
    from ray.data.aggregate import Min

    from .sketch import bloom_contains, bloom_sketch

    def fp_col(batch: pa.Table) -> pa.Table:
        fp = [
            hashlib.md5(s.encode()).hexdigest()
            for s in batch.column(text_col).to_pylist()
        ]
        return pa.table({"fp": pa.array(fp, pa.string())})

    base_fps = base.select_columns([text_col]).map_batches(
        fp_col, batch_format="pyarrow"
    )
    words = bloom_sketch(base_fps, "fp")
    ref = ray.put(words)

    def gate(batch: pa.Table) -> pa.Table:
        fp = [
            hashlib.md5(s.encode()).hexdigest()
            for s in batch.column(text_col).to_pylist()
        ]
        in_base = bloom_contains(ray.get(ref), fp)
        t = pa.table(
            {"doc_id": batch.column("doc_id"), "fp": pa.array(fp, pa.string())}
        )
        return t.filter(pa.array(~in_base))

    survivors = delta.select_columns(["doc_id", text_col]).map_batches(
        gate, batch_format="pyarrow"
    )
    return (
        survivors.groupby("fp")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .map_batches(
            lambda t: t.select(["doc_id", "fp"]), batch_format="pyarrow"
        )
    )
