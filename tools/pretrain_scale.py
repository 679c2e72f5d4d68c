#!/usr/bin/env python
"""Corpus-scale skip-gram pretrain through the sharded SGNS path (round-4
verdict #2): generate an N-sentence synthetic corpus distributed (default
100k sentences ≈ 12.5× the 8k-sentence SemEval train file), build the
vocab, measure DISTRIBUTED pair-generation throughput, then train
parameter-averaged SGNS (``train_skipgram_sharded`` — pair shards live in
the object store, epochs ship O(V×dim) weights) over a window × dim grid.

Quality signal per arm: the intrinsic CONTRAST score — mean SGNS score
``w_in[center]·w_out[context]`` of observed pairs minus the same over
randomly re-paired ids on one 50k sample (positive and growing ⇒ the
vectors encode the corpus co-occurrence structure; 0 ⇒ untrained noise).
Input·input cosine is NOT used: co-occurrence similarity is syntagmatic
and measured negative (-0.09) on a corpus where training succeeds.

The reference pretrains on 31.6M wiki sentences (wiki2sdp.py:285) and
initializes RelEmbed from 3M×300 GoogleNews vectors
(RelEmbed_semeval.ipynb cell 9); neither corpus can ship here, so the
scale path is exercised on the synthetic corpus and the REAL fixture's
init stays the 8k-sentence self-trained vectors (BASELINE.md).

Run:  python tools/pretrain_scale.py [--sentences 100000] [--out /tmp/pretrain_scale.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sentences", type=int, default=100_000)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--grid", default="2x32,4x32,8x32,4x64")
    ap.add_argument("--out", default="/tmp/pretrain_scale.json")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from relation_extraction_ray.config import KGConfig
    from relation_extraction_ray.functions.training import (
        skipgram_pairs,
        train_skipgram_sharded,
    )
    from relation_extraction_ray.pipelines.fit import build_record_vocabs
    from relation_extraction_ray.sources.semeval import RECORD_SCHEMA, gen_labeled_sentence, parsed_records

    n = args.sentences
    results: dict = {
        "sentences": n,
        "n_shards": args.n_shards,
        "num_cpus": args.num_cpus,
        "arms": {},
    }

    def gen(batch: pa.Table) -> pa.Table:
        rows = [gen_labeled_sentence(int(i)) for i in batch.column("id").to_pylist()]
        return pa.Table.from_pylist(rows, schema=RECORD_SCHEMA)

    t0 = time.time()
    records = rd.range(n, override_num_blocks=args.blocks).map_batches(gen, batch_format="pyarrow")
    parsed = parsed_records(records).materialize()
    results["corpus_gen_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    vocabs = build_record_vocabs(parsed, KGConfig(min_count=2))
    (wv, w2i, _), _, _ = vocabs
    results["vocab_size"] = len(wv)
    results["vocab_sec"] = round(time.time() - t0, 1)
    print(f"corpus {n} sentences, vocab {len(wv)}", flush=True)

    def contrast(w_in: np.ndarray, w_out: np.ndarray, sample: pa.Table) -> float:
        """Mean w_in[center]·w_out[context] of observed pairs minus the
        same over randomly re-paired ids — the model's actual SGNS score
        (input·input cosine of co-occurring words is syntagmatic and can
        be legitimately negative even when training succeeds)."""
        c = sample.column("center").to_numpy()
        x = sample.column("context").to_numpy()
        obs = float((w_in[c] * w_out[x]).sum(axis=1).mean())
        rng = np.random.default_rng(13)
        rnd = float((w_in[c] * w_out[rng.permutation(x)]).sum(axis=1).mean())
        return round(obs - rnd, 4)

    pair_cache: dict[int, tuple] = {}
    for arm in args.grid.split(","):
        w, dim = (int(v) for v in arm.split("x"))
        if w not in pair_cache:
            t0 = time.time()
            pairs = skipgram_pairs(parsed, w2i, window=w).materialize()
            n_pairs = pairs.count()
            gen_sec = round(time.time() - t0, 1)
            sample = pairs.limit(50_000).take_batch(50_000, batch_format="pyarrow")
            pair_cache[w] = (pairs, n_pairs, gen_sec, sample)
        pairs, n_pairs, gen_sec, sample = pair_cache[w]
        t0 = time.time()
        w_in, w_out = train_skipgram_sharded(
            pairs, len(wv), dim=dim, epochs=args.epochs, n_shards=args.n_shards,
            return_context=True,
        )
        train_sec = round(time.time() - t0, 1)
        rec = {
            "window": w,
            "dim": dim,
            "n_pairs": n_pairs,
            "pairgen_sec": gen_sec,
            "pairs_per_sec": int(n_pairs / max(gen_sec, 0.001)),
            "train_sec": train_sec,
            "pairs_per_sec_train": int(n_pairs * args.epochs / max(train_sec, 0.001)),
            "contrast": contrast(w_in, w_out, sample),
            "max_abs_w": round(float(np.abs(w_in).max()), 4),
        }
        results["arms"][f"w{w}_d{dim}"] = rec
        print(f"[w{w}_d{dim}] {json.dumps(rec)}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
