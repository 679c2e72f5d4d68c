"""Evaluation: confusion matrix + P/R/F1 (SURVEY.md A4) and the triple-set
P/R gate (BASELINE.md), both as distributed aggregates with tiny
driver-side finalization.

Reproduces ``experiment_helper.confusion_matrix`` semantics
(``experiment_helper.py:8-88``): per-class precision/recall/F1, micro and
macro averages, optional exclusion of ``Other`` — the official-scorer-style
"directional, excluding Other" macro-F1 of the reference's notebooks.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import ray


def confusion_counts(preds: ray.data.Dataset, pred_col: str = "pred", label_col: str = "label") -> ray.data.Dataset:
    """(pred, label) pair counts — the distributed half of A4."""

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[tuple[str, str], int] = defaultdict(int)
        for p, l in zip(batch.column(pred_col).to_pylist(), batch.column(label_col).to_pylist()):
            agg[(p, l)] += 1
        keys = sorted(agg)
        return pa.Table.from_pydict(
            {
                "pred": [k[0] for k in keys],
                "label": [k[1] for k in keys],
                "n": pa.array([agg[k] for k in keys], pa.int64()),
            }
        )

    return (
        preds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pred", "label"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )


def prf_from_counts(rows: list[dict], exclude: tuple[str, ...] = ("Other",)) -> dict:
    """Driver-side finalize: per-class + micro/macro P/R/F1 from the small
    (pred, label, n) table.  ``exclude`` classes are dropped from the macro
    and micro numerators/denominators exactly as the official scorer
    excludes Other."""
    tp: dict[str, int] = defaultdict(int)
    pred_n: dict[str, int] = defaultdict(int)
    gold_n: dict[str, int] = defaultdict(int)
    for r in rows:
        p, l, n = r["pred"], r["label"], r["n"]
        pred_n[p] += n
        gold_n[l] += n
        if p == l:
            tp[p] += n
    classes = sorted((set(pred_n) | set(gold_n)) - set(exclude))
    per_class = {}
    mtp = mp = mg = 0
    psum = rsum = fsum = 0.0
    for c in classes:
        p = tp[c] / pred_n[c] if pred_n[c] else 0.0
        r = tp[c] / gold_n[c] if gold_n[c] else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        per_class[c] = {"precision": p, "recall": r, "f1": f, "support": gold_n[c]}
        mtp += tp[c]
        mp += pred_n[c]
        mg += gold_n[c]
        psum += p
        rsum += r
        fsum += f
    n_cls = max(1, len(classes))
    micro_p = mtp / mp if mp else 0.0
    micro_r = mtp / mg if mg else 0.0
    return {
        "per_class": per_class,
        "macro_precision": psum / n_cls,
        "macro_recall": rsum / n_cls,
        "macro_f1": fsum / n_cls,
        "micro_precision": micro_p,
        "micro_recall": micro_r,
        "micro_f1": 2 * micro_p * micro_r / (micro_p + micro_r) if micro_p + micro_r else 0.0,
    }


def evaluate_classification(preds: ray.data.Dataset, exclude: tuple[str, ...] = ("Other",)) -> dict:
    return prf_from_counts(confusion_counts(preds).take_all(), exclude=exclude)


def score_triples(
    got: ray.data.Dataset,
    gold: ray.data.Dataset,
    keys: tuple[str, ...] = ("doc_id", "subj", "pred", "obj"),
) -> dict:
    """Set-level P/R/F1 of emitted vs gold triples — the BASELINE P/R ≥ 0.95
    gate, as a distributed outer-join-by-aggregation: tag each side, one
    groupby over the union, flag-count partials, global sums.  Duplicate
    triples on either side count once (set semantics)."""

    def tag(flag_col: str):
        def f(batch: pa.Table) -> pa.Table:
            cols = {k: batch.column(k) for k in keys}
            n = batch.num_rows
            cols["in_got"] = pa.array([1 if flag_col == "in_got" else 0] * n, pa.int64())
            cols["in_gold"] = pa.array([1 if flag_col == "in_gold" else 0] * n, pa.int64())
            return pa.Table.from_pydict(cols)

        return f

    both = got.map_batches(tag("in_got"), batch_format="pyarrow").union(
        gold.map_batches(tag("in_gold"), batch_format="pyarrow")
    )
    per_key = both.groupby(list(keys)).aggregate(
        ray.data.aggregate.Max("in_got", alias_name="in_got"),
        ray.data.aggregate.Max("in_gold", alias_name="in_gold"),
    )

    def flags(batch: pa.Table) -> pa.Table:
        g = batch.column("in_got").to_pylist()
        k = batch.column("in_gold").to_pylist()
        return pa.Table.from_pydict(
            {
                "tp": pa.array([int(a and b) for a, b in zip(g, k)], pa.int64()),
                "got": pa.array([int(a) for a in g], pa.int64()),
                "gold": pa.array([int(b) for b in k], pa.int64()),
            }
        )

    sums = per_key.map_batches(flags, batch_format="pyarrow").sum(["tp", "got", "gold"])
    tp, n_got, n_gold = sums["sum(tp)"], sums["sum(got)"], sums["sum(gold)"]
    precision = tp / n_got if n_got else 0.0
    recall = tp / n_gold if n_gold else 0.0
    return {
        "tp": tp,
        "n_got": n_got,
        "n_gold": n_gold,
        "precision": precision,
        "recall": recall,
        "f1": 2 * precision * recall / (precision + recall) if precision + recall else 0.0,
    }
