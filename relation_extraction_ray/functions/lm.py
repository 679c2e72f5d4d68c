"""Count-based bigram language-model scoring — the CCNet-style
perplexity quality filter a large-scale training-data pipeline runs to
rank documents (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", 2020 — public method; the
production recipe scores web text under a KenLM n-gram model and keeps
the low-perplexity head).

This implements the distributed shape with an exactly-replayable model:

  pass 1  raw unigram counts (per-batch ``value_counts`` partials → one
          small groupby) → vocabulary = tokens with count ≥ min_count;
          out-of-vocab tokens map to ``<unk>`` (reference vocab-truncation
          semantics, ``wiki2sdp.py:223-233``)
  pass 2  mapped unigram + bigram counts in ONE pass / one keyed groupby
          (rows tagged u/b) — the model
  pass 3  score every doc: add-one-smoothed bigram negative log-prob
          ``-ln P(w2|w1) = ln(cu(w1)+V) - ln(cb(w1,w2)+1)`` summed over
          the doc's adjacent mapped-token pairs, fully vectorized
          (``pc.index_in`` against the broadcast model arrays + one
          ``np.log`` over the flattened bigram stream + offset
          cum-differencing for the per-doc reduction)

The model here is self-trained on the scored corpus (deterministic, SQL-
replayable end-to-end); a production filter would train pass 1-2 on a
reference corpus and score a different one — same stages, different
input bindings.  The broadcast is O(model); above a byte bound the
score-time lookups would become the engine's standard hash-partitioned
pair join (``functions/joins.py``), the same planner split as
``verify_jaccard`` — at a CCNet-style pruned vocab (64k types) the
bigram table is far under the bound, so only the broadcast path is
implemented.

Output (one row per input doc): ``doc_id``, ``n_tokens`` (non-empty
tokens), ``n_unk`` (tokens mapped to <unk>), ``n_bigrams``, and
``nll_milli`` = round(1000 × mean bigram negative log-prob) as int64
(0 when the doc has no bigram).  Integer columns are drift-free; the
milli-rounded mean keeps float error (~1e-13) nine orders of magnitude
below the rounding step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .text import _split_lower

UNK = "<unk>"


def _doc_token_arrays(batch: pa.Table, text_col: str):
    """(values, offsets) of the per-doc NON-EMPTY lowercase tokens —
    flattened token stream + int64 doc offsets (SQL ``list_filter(
    string_split(lower(text),' '), t->t<>'')`` semantics)."""
    lists = _split_lower(batch.column(text_col))
    la = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    values = la.values
    offsets = np.asarray(la.offsets, dtype=np.int64)
    keep = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    kept_values = values.filter(pa.array(keep))
    cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(keep.astype(np.int64))])
    new_offsets = cum[offsets]
    return kept_values, new_offsets


def _bigram_index_arrays(offsets: np.ndarray):
    """Indices (i1, i2) into the flattened token stream for every
    within-doc adjacent pair, plus per-doc bigram offsets."""
    n = offsets[-1] if len(offsets) else 0
    lens = offsets[1:] - offsets[:-1]
    blens = np.maximum(lens - 1, 0)
    boffsets = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(blens)])
    mask = np.ones(int(n), dtype=bool)
    ends = offsets[1:][lens > 0]
    mask[ends - 1] = False
    i1 = np.flatnonzero(mask)
    return i1, i1 + 1, boffsets


def bigram_lm_score(
    docs: ray.data.Dataset, min_count: int = 5, text_col: str = "text"
) -> ray.data.Dataset:
    """Per-doc bigram-LM negative-log-prob quality score (see module doc)."""

    # ---- pass 1: raw unigram counts → kept vocabulary -----------------
    def uni_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(_split_lower(batch.column(text_col)))
        vc = toks.value_counts()
        tokens, counts = vc.field("values"), vc.field("counts")
        mask = pc.not_equal(tokens, "")
        return pa.Table.from_pydict(
            {"token": tokens.filter(mask), "cnt": counts.filter(mask).cast(pa.int64())}
        )

    counted = docs.map_batches(uni_partial, batch_format="pyarrow").groupby("token").sum("cnt")
    kept = counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("sum(cnt)"), min_count)).select(["token"]),
        batch_format="pyarrow",
    )
    vocab_tbl = pa.concat_tables(list(kept.iter_batches(batch_format="pyarrow")))
    vocab_arr = vocab_tbl.column("token").combine_chunks()
    v_smooth = len(vocab_arr) + 1  # +1 for <unk>
    vocab_ref = ray.put(vocab_arr)

    def _mapped_tokens(batch: pa.Table):
        vocab = ray.get(vocab_ref)
        values, offsets = _doc_token_arrays(batch, text_col)
        in_v = pc.is_in(values, value_set=vocab)
        mapped = pc.if_else(in_v, values, pa.scalar(UNK))
        return mapped, offsets, in_v

    # ---- pass 2: mapped unigram + bigram counts (one groupby) ---------
    def model_partial(batch: pa.Table) -> pa.Table:
        mapped, offsets, _ = _mapped_tokens(batch)
        i1, i2, _ = _bigram_index_arrays(offsets)
        grams = pc.binary_join_element_wise(
            mapped.take(pa.array(i1)), mapped.take(pa.array(i2)), " "
        )
        out_keys, out_kinds, out_cnts = [], [], []
        for kind, arr in (("u", mapped), ("b", grams)):
            vc = arr.value_counts()
            out_keys.append(vc.field("values"))
            out_cnts.append(vc.field("counts").cast(pa.int64()))
            out_kinds.append(pa.array([kind] * len(vc), pa.string()))
        return pa.Table.from_pydict(
            {
                "kind": pa.concat_arrays(out_kinds),
                "key": pa.concat_arrays([k.cast(pa.string()) for k in out_keys]),
                "cnt": pa.concat_arrays(out_cnts),
            }
        )

    model = (
        docs.map_batches(model_partial, batch_format="pyarrow")
        .groupby(["kind", "key"])
        .sum("cnt")
    )
    u_keys, u_cnts, b_keys, b_cnts = [], [], [], []
    for bt in model.iter_batches(batch_format="pyarrow"):
        kinds = bt.column("kind").to_numpy(zero_copy_only=False)
        keys = bt.column("key").combine_chunks()
        cnts = bt.column("sum(cnt)").combine_chunks()
        um, bm = pa.array(kinds == "u"), pa.array(kinds == "b")
        u_keys.append(keys.filter(um))
        u_cnts.append(cnts.filter(um))
        b_keys.append(keys.filter(bm))
        b_cnts.append(cnts.filter(bm))
    model_ref = ray.put(
        (
            pa.concat_arrays(u_keys),
            np.concatenate([np.asarray(c) for c in u_cnts]).astype(np.int64)
            if u_cnts
            else np.array([], dtype=np.int64),
            pa.concat_arrays(b_keys),
            np.concatenate([np.asarray(c) for c in b_cnts]).astype(np.int64)
            if b_cnts
            else np.array([], dtype=np.int64),
        )
    )

    # ---- pass 3: score ------------------------------------------------
    def score(batch: pa.Table) -> pa.Table:
        uk, uc, bk, bc = ray.get(model_ref)
        mapped, offsets, in_v = _mapped_tokens(batch)
        i1, i2, boffsets = _bigram_index_arrays(offsets)
        n_tokens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        unk_np = pc.invert(in_v).to_numpy(zero_copy_only=False).astype(np.int64)
        cum_unk = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(unk_np)])
        n_unk = cum_unk[offsets[1:]] - cum_unk[offsets[:-1]]
        n_bigrams = (boffsets[1:] - boffsets[:-1]).astype(np.int64)

        grams = pc.binary_join_element_wise(
            mapped.take(pa.array(i1)), mapped.take(pa.array(i2)), " "
        )
        w1 = mapped.take(pa.array(i1))
        cu = uc[np.asarray(pc.index_in(w1, value_set=uk))] if len(i1) else np.array([])
        cb = bc[np.asarray(pc.index_in(grams, value_set=bk))] if len(i1) else np.array([])
        nll = np.log(cu + v_smooth) - np.log(cb + 1.0)
        cum_ll = np.concatenate([np.zeros(1), np.cumsum(nll)])
        tot = cum_ll[boffsets[1:]] - cum_ll[boffsets[:-1]]
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(n_bigrams > 0, tot / np.maximum(n_bigrams, 1), 0.0)
        milli = np.floor(mean * 1000.0 + 0.5).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_unk": pa.array(n_unk, pa.int64()),
                "n_bigrams": pa.array(n_bigrams, pa.int64()),
                "nll_milli": pa.array(milli, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
