"""BM25 full-corpus search — the retrieval primitive a training-data
pipeline uses for quality-targeted selection (retrieve-then-filter, hard
negative mining, contamination probes against an eval query set).

Scale shape (the part that must survive 100 TB):

* **Stats pass** — ONE streaming scan emits a tiny per-batch partial
  table: one row per *query term* present in the batch (its batch-level
  document frequency) plus one sentinel row carrying (Σ doc length,
  n docs).  The shuffle is bounded by ``(|query terms| + 1) ×
  n_batches`` rows regardless of corpus size; the reduce is one small
  ``groupby(key).sum``.
* **Broadcast** — the resulting ``term → (df, idf)`` map plus
  ``(N, avgdl)`` is O(|query terms|); it ships once via closure capture
  (a production multi-thousand-query workload would ``ray.put`` it, the
  T5/T6 pattern).
* **Score pass** — a second streaming scan.  Term frequencies come from
  the same vectorized Arrow flatten/hash-aggregate kernel tf-idf uses;
  scoring is numpy scatter-adds per query; each batch keeps only its
  LOCAL top-k per query, so at most ``k × |queries|`` rows per batch
  reach the final select.  Global top-k over that bounded candidate set
  is a single-block rank (``repartition(1)``) — exact because the global
  top-k is always a subset of the union of per-batch top-ks.

Numeric determinism: per-(doc, term) BM25 contributions are rounded to
integer micro-units FIRST and the per-doc score is an *integer* sum, so
the result is independent of the order terms are added in — float
addition non-associativity can never flip a rank between the engine and
the SQL replay.  The idf is the log-free rational surrogate
``(N - df + 0.5) / (df + 0.5) + 1`` (monotone in the classic
Robertson/Sparck-Jones idf): division and multiplication are IEEE
correctly-rounded and bit-identical between numpy and DuckDB, while
``ln`` is a libm call with no such guarantee.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .text import _split_lower

#: Classic BM25 constants (k1, b) — written as the exact literals the SQL
#: oracle uses so both engines parse the same doubles.
BM25_K1 = 1.2
BM25_B = 0.75

_STATS_KEY = "\x00stats"


def _tf_dl(batch: pa.Table, text_col: str) -> tuple[pa.Table, np.ndarray]:
    """(doc-term frequencies, per-row non-empty token counts) for a batch —
    one list-flatten + one Arrow hash aggregate, no per-row Python."""
    lists = _split_lower(batch.column(text_col))
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    rows = parent.filter(mask)
    grouped = (
        pa.table({"row": rows, "token": flat.filter(mask)})
        .group_by(["row", "token"])
        .aggregate([("token", "count")])
    )
    dl = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(dl, rows.to_numpy(zero_copy_only=False), 1)
    return grouped, dl


def bm25_search(
    docs: ray.data.Dataset,
    queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Top-``k`` documents per query by BM25 (Robertson et al., TREC-3;
    the Okapi weighting every production retrieval stack descends from).

    ``queries`` is a list of ``(query_id, query_text)``; query text is
    tokenized with the corpus tokenizer (lower + single-space split).
    Output: ``(query_id, doc_id, score_micro, rank)`` with
    ``score_micro = Σ_t floor(1e6 · idf_t · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)) + 0.5)``
    summed over the query's distinct terms, rank ties broken doc_id asc.
    """
    q_terms: dict[int, list[str]] = {
        qid: sorted({t for t in text.lower().split(" ") if t})
        for qid, text in queries
    }
    all_terms = sorted({t for ts in q_terms.values() for t in ts})
    term_arr = pa.array(all_terms, pa.string())

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf, dl = _tf_dl(batch, text_col)
        toks = tf.column("token")
        hit = tf.filter(pc.is_in(toks, value_set=term_arr))
        vc = hit.column("token").combine_chunks().value_counts()
        keys = vc.field("values").to_pylist() + [_STATS_KEY]
        dfs = vc.field("counts").to_pylist() + [0]
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "dl_sum": pa.array([0] * len(dfs[:-1]) + [int(dl.sum())], pa.int64()),
                "n": pa.array([0] * len(dfs[:-1]) + [batch.num_rows], pa.int64()),
            }
        )

    stats = (
        docs.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("key")
        .sum(["df", "dl_sum", "n"])
        .to_pandas()
    )
    srow = stats[stats["key"] == _STATS_KEY].iloc[0]
    n_docs = int(srow["sum(n)"])
    avgdl = float(srow["sum(dl_sum)"]) / float(n_docs)
    df_map = {
        r["key"]: int(r["sum(df)"])
        for _, r in stats.iterrows()
        if r["key"] != _STATS_KEY
    }
    # log-free idf surrogate — identical expression in the SQL oracle
    idf = {
        t: ((n_docs - df_map.get(t, 0)) + 0.5) / (df_map.get(t, 0) + 0.5) + 1.0
        for t in all_terms
    }
    out_schema = pa.schema(
        [
            ("query_id", pa.int64()),
            ("doc_id", pa.int64()),
            ("score_micro", pa.int64()),
        ]
    )

    def score(batch: pa.Table) -> pa.Table:
        tf, dl = _tf_dl(batch, text_col)
        toks = tf.column("token")
        hit = tf.filter(pc.is_in(toks, value_set=term_arr))
        if hit.num_rows == 0:
            return out_schema.empty_table()
        rows = hit.column("row").to_numpy(zero_copy_only=False)
        tok_l = hit.column("token").to_pylist()
        tf_np = hit.column("token_count").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        dl_np = dl[rows].astype(np.float64)
        # per-(doc, term) contribution, integer-rounded BEFORE the per-doc
        # sum so addition order can never matter
        idf_np = np.array([idf[t] for t in tok_l], dtype=np.float64)
        denom = tf_np + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl_np / avgdl))
        contrib = np.floor(
            idf_np * ((tf_np * (BM25_K1 + 1.0)) / denom) * 1000000.0 + 0.5
        ).astype(np.int64)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        parts = []
        for qid, terms in q_terms.items():
            sel = np.isin(np.asarray(tok_l, dtype=object), np.asarray(terms, object))
            if not sel.any():
                continue
            sc = np.zeros(batch.num_rows, dtype=np.int64)
            np.add.at(sc, rows[sel], contrib[sel])
            nz = np.flatnonzero(sc)
            if len(nz) == 0:
                continue
            # local top-k: global top-k ⊆ union of per-batch top-ks
            order = np.lexsort((doc_ids[nz], -sc[nz]))[:k]
            keep = nz[order]
            parts.append(
                pa.table(
                    {
                        "query_id": pa.array([qid] * len(keep), pa.int64()),
                        "doc_id": pa.array(doc_ids[keep], pa.int64()),
                        "score_micro": pa.array(sc[keep], pa.int64()),
                    }
                )
            )
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    def global_topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch,
            sort_keys=[
                ("query_id", "ascending"),
                ("score_micro", "descending"),
                ("doc_id", "ascending"),
            ],
        )
        s = batch.take(order)
        q = s.column("query_id").to_numpy()
        new_q = np.concatenate([[True], q[1:] != q[:-1]])
        starts = np.flatnonzero(new_q)
        rank = (
            np.arange(len(q), dtype=np.int64)
            - np.repeat(starts, np.diff(np.concatenate([starts, [len(q)]])))
            + 1
        )
        s = s.append_column("rank", pa.array(rank, pa.int64()))
        return s.filter(pa.array(rank <= k))

    candidates = docs.map_batches(score, batch_format="pyarrow")
    # candidate set is ≤ k × |queries| × n_batches rows — single-block rank
    return candidates.repartition(1).map_batches(global_topk, batch_format="pyarrow")
