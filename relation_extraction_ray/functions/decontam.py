"""Benchmark decontamination: flag corpus documents that share a word
n-gram with an evaluation set.

The standard pretraining-hygiene step (GPT-3 appendix C's 13-gram
overlap filter; Gopher/MassiveText §A.2 does the same at 8 grams): any
training document containing an n-gram that also appears in a held-out
benchmark is contaminated and must be dropped or audited before
training.  Two halves:

* :func:`synthetic_benchmark_grams` — derives a deterministic stand-in
  eval set from the corpus itself (every ``every``-th doc contributes
  the n-grams of one token window), so tests and benchmarks need no
  external data.  Real users pass their own benchmark text instead.
* :func:`decontaminate` — the scan.  The benchmark gram set is
  broadcast once (``ray.put``; eval sets are small by nature — even
  100k benchmark items × ~100 grams is tens of MB against a 100-TB
  corpus, the canonical broadcast-small-side shape), and each batch
  generates its documents' n-grams fully vectorized and probes them
  with one ``pyarrow.compute.is_in`` against the broadcast value set.
  Matching is on the exact gram STRING — no hash, so a driver oracle
  comparing against SQL-generated grams can never collision-drift.
  Per-doc hit counts aggregate inside the batch (a document is one
  row, so no shuffle exists anywhere in the operator); output is the
  contamination report ``(doc_id, n_hits)`` with ``n_hits`` = distinct
  matched grams, rows only for contaminated docs.

Scale shape (100 TB): one streaming pass over the corpus, zero keyed
exchanges, benchmark grams resident per worker process via the task
cache.  The gram generator is shared with the benchmark side and does
no per-row Python: token lists come from ``pc.split_pattern``, window
start positions from numpy ``repeat``/``cumsum`` arithmetic, and the
gram strings from ``n`` elementwise joins over the flat token array.

No reference counterpart (teffland/Relation-Extraction has no
decontamination); engine addition per the LLM-data-pipeline mandate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def ngram_strings(texts: pa.ChunkedArray | pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word ``n``-grams of each text, vectorized.

    Returns ``(doc_index, grams)`` — parallel arrays with one entry per
    gram, ``doc_index`` pointing back into the input row order.  A text
    with fewer than ``n`` tokens contributes nothing.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, pattern=" ")
    flat = toks.values.to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy().astype(np.int64)
    lens = np.diff(offs)
    g_per = np.maximum(lens - (n - 1), 0)
    total = int(g_per.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, dtype=object)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), g_per)
    # start of each gram in `flat`: the doc's offset + its within-doc rank
    starts = np.repeat(offs[:-1], g_per) + (
        np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(g_per) - g_per, g_per)
    )
    grams = flat[starts]
    space = np.array(" ", dtype=object)
    for k in range(1, n):
        grams = grams + space + flat[starts + k]
    return doc_idx, grams


def synthetic_benchmark_grams(
    docs: ray.data.Dataset,
    n: int = 8,
    every: int = 19,
    window: tuple[int, int] = (2, 18),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[str]:
    """Deterministic eval-set stand-in: docs with ``id % every == 0``
    contribute the ``n``-grams of ``tokens[window[0]:window[1]]``.

    The selection and window are pure functions of the input, so tests,
    the driver oracle, and reruns all derive the identical set with no
    external benchmark file.  Collected to the driver (sorted, distinct)
    — this is the genuinely-small side of the operator.
    """
    lo, hi = window

    def part(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(ids % every == 0))
        if sel.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string())})
        windows = pc.binary_join(
            pc.list_slice(pc.split_pattern(sel.column(text_col), pattern=" "), lo, hi),
            " ",
        )
        _, grams = ngram_strings(windows.combine_chunks(), n)
        return pa.table({"g": pa.array(np.unique(grams), type=pa.string())})

    out = docs.map_batches(part, batch_format="pyarrow").take_all()
    return sorted({r["g"] for r in out})


class DecontamStage:
    """Per-batch contamination scan against a broadcast gram set."""

    def __init__(self, bench_ref, n: int, id_col: str, text_col: str) -> None:
        grams = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        self.value_set = pa.array(grams, type=pa.string())
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_type = batch.column(self.id_col).type
        doc_idx, grams = ngram_strings(batch.column(self.text_col), self.n)
        empty = pa.table(
            {
                self.id_col: pa.array([], type=id_type),
                "n_hits": pa.array([], type=pa.int64()),
            }
        )
        if len(grams) == 0:
            return empty
        gram_arr = pa.array(grams, type=pa.string())
        mask = pc.is_in(gram_arr, value_set=self.value_set).to_numpy(zero_copy_only=False)
        if not mask.any():
            return empty
        hits = pa.table(
            {"di": pa.array(doc_idx[mask]), "g": gram_arr.filter(pa.array(mask))}
        )
        agg = hits.group_by("di").aggregate([("g", "count_distinct")])
        return pa.table(
            {
                self.id_col: batch.column(self.id_col).take(agg.column("di")),
                "n_hits": agg.column("g_count_distinct").cast(pa.int64()),
            }
        )


def decontaminate(
    docs: ray.data.Dataset,
    bench_grams: "list[str] | ray.ObjectRef",
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Contamination report: ``(id_col, n_hits)`` for every document
    sharing at least one word ``n``-gram with ``bench_grams``.

    ``n_hits`` counts DISTINCT matched grams.  Pass the gram list (or an
    already-``ray.put`` ref when reusing one set across calls); the scan
    is a single stateless streaming pass — drop contaminated docs by
    anti-joining this report, or audit it directly.
    """
    from ..taskexec import cached_stage_fn

    if isinstance(bench_grams, ray.ObjectRef):
        ref = bench_grams
    else:
        ref = ray.put(list(bench_grams))
    return docs.map_batches(
        cached_stage_fn(
            DecontamStage,
            (ref.hex(), n, id_col, text_col),
            {"bench_ref": ref, "n": n, "id_col": id_col, "text_col": text_col},
        ),
        batch_format="pyarrow",
    )
