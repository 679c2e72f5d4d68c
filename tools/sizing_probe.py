#!/usr/bin/env python
"""10⁷-row sizing probe for the dedup/ANN family (round-4 verdict #7).

Generates a deterministic synthetic corpus (exact-dup + near-dup tail) and
an embedding table (planted near-dup vectors) at ``--rows`` scale, runs
each family END-TO-END through its public entry point, and reports
walltime, output rows, and the max / p99 per-partition (or per-bucket)
rows at the family's keyed exchange — validating ``derive_n_parts`` /
``derived_num_parts`` / ``derived_n_planes`` far outside sf0.1 (40k rows).

The partition histogram is recomputed from the family's own stage classes
over the same materialized input (one extra cheap scan); the recorded
walltime covers only the public pipeline call.

Run:  python tools/sizing_probe.py --rows 10000000 \
          [--families minhash,ngram,embed,knn_lsh,pq] [--out /tmp/probe.json]
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

VOCAB = 50_000
WORDS_PER_DOC = 8
DIM = 32


def gen_docs(n: int, blocks: int):
    """doc_id + text: 8 tokens drawn deterministically from a 50k vocab;
    every 40th row is an EXACT duplicate of its predecessor, every other
    20th row a near-duplicate (last token changed)."""
    import ray.data as rd

    from relation_extraction_ray.functions.joins import _mix64

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        dup = (ids % 20 == 1).astype(np.int64)
        base = ids - dup
        w = np.stack(
            [
                _mix64((base * WORDS_PER_DOC + k).astype(np.uint64)) % VOCAB
                for k in range(WORDS_PER_DOC)
            ],
            axis=1,
        )
        near = (ids % 20 == 1) & (ids % 40 != 1)  # 40th stays exact
        w[:, -1] = np.where(near, (w[:, -1] + 1) % VOCAB, w[:, -1])
        texts = [" ".join(f"t{int(v):05d}" for v in row) for row in w]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )

    return rd.range(n, override_num_blocks=blocks).map_batches(gen, batch_format="pyarrow")


def gen_vecs(n: int, blocks: int):
    """vec_id + embedding (list<double>, DIM): deterministic pseudo-random
    unit-cube vectors; every 50th row duplicates its predecessor with a
    1e-3 perturbation (cosine ≈ 1)."""
    import ray.data as rd

    from relation_extraction_ray.functions.joins import _mix64

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        base = ids - (ids % 50 == 1).astype(np.int64)
        m = np.stack(
            [
                _mix64((base * DIM + k).astype(np.uint64)).astype(np.float64)
                for k in range(DIM)
            ],
            axis=1,
        )
        m = m / 2**63 - 1.0
        m = m + ((ids % 50) == 1).astype(np.float64)[:, None] * 1e-3
        emb = pa.FixedSizeListArray.from_arrays(pa.array(m.ravel(), pa.float64()), DIM)
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": emb})

    return rd.range(n, override_num_blocks=blocks).map_batches(gen, batch_format="pyarrow")


def part_hist(ds, key_cols: list[str], n_parts: int) -> dict:
    """Distributed per-partition row counts of ds keyed like the family's
    exchange: per-batch bincount partials → one tiny groupby."""
    from relation_extraction_ray.functions.joins import part_array

    def partial(batch: pa.Table) -> pa.Table:
        p = part_array(batch, key_cols, n_parts).to_numpy()
        c = np.bincount(p, minlength=n_parts)
        return pa.table(
            {
                "part": pa.array(np.arange(n_parts), pa.int32()),
                "n": pa.array(c, pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("part").sum("n")
    counts = np.array([r["sum(n)"] for r in agg.take_all()], dtype=np.int64)
    return {
        "n_parts": n_parts,
        "exchange_rows": int(counts.sum()),
        "max_part_rows": int(counts.max()),
        "p99_part_rows": int(np.percentile(counts, 99)),
    }


def bucket_hist(bucketed, col: str = "bucket") -> dict:
    """Max / p99 rows per LSH bucket (the knn_lsh group key)."""

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.column(col).combine_chunks().to_numpy()
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(vals.astype(np.int64), pa.int64()), "n": pa.array(cnts, pa.int64())}
        )

    agg = bucketed.map_batches(partial, batch_format="pyarrow").groupby("bucket").sum("n")
    counts = np.array([r["sum(n)"] for r in agg.take_all()], dtype=np.int64)
    return {
        "n_buckets": int(len(counts)),
        "max_bucket_rows": int(counts.max()),
        "p99_bucket_rows": int(np.percentile(counts, 99)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--families", default="minhash,ngram,embed,knn_lsh,pq")
    ap.add_argument("--blocks", type=int, default=256)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="/tmp/sizing_probe.json")
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

    from relation_extraction_ray.functions.ann import (
        BandedLshStage,
        LshBucketStage,
        derived_n_planes,
        embed_neardup_pairs,
        knn_lsh,
    )
    from relation_extraction_ray.functions.dedup import (
        MinHashStage,
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
    )
    from relation_extraction_ray.functions.joins import derived_num_parts
    from relation_extraction_ray.taskexec import cached_stage_fn

    want = set(args.families.split(","))
    n = args.rows
    results: dict[str, dict] = {"rows": n, "num_cpus": args.num_cpus, "families": {}}

    def record(name: str, rec: dict) -> None:
        results["families"][name] = rec
        print(f"[{name}] {json.dumps(rec)}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    docs = None
    if want & {"minhash", "ngram"}:
        t0 = time.time()
        docs = gen_docs(n, args.blocks).materialize()
        print(f"docs generated: {docs.count()} in {time.time()-t0:.0f}s", flush=True)

    if "minhash" in want:
        t0 = time.time()
        out_rows = minhash_candidate_pairs(docs, num_perm=64, bands=8).count()
        wall = time.time() - t0
        bands_ds = docs.map_batches(
            cached_stage_fn(
                MinHashStage, (64, 8, 3), {"num_perm": 64, "bands": 8, "shingle_n": 3}
            ),
            batch_format="pyarrow",
        )
        rec = {"wall_sec": round(wall, 1), "out_rows": out_rows}
        rec.update(part_hist(bands_ds, ["band", "bucket"], derived_num_parts()))
        record("minhash", rec)

    if "ngram" in want:
        t0 = time.time()
        out_rows = ngram_jaccard_pairs(docs, threshold=0.8).count()
        wall = time.time() - t0
        # hot exchange: the exploded (shingle, doc_id, size) rows on ["s"]
        from relation_extraction_ray.functions.dedup import shingle_set

        def explode(batch: pa.Table) -> pa.Table:
            sh_col, id_col = [], []
            for doc_id, text in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                for s in shingle_set(text, 3):
                    sh_col.append(s)
                    id_col.append(doc_id)
            return pa.table(
                {"s": pa.array(sh_col, pa.string()), "doc_id": pa.array(id_col, pa.int64())}
            )

        exploded = docs.map_batches(explode, batch_format="pyarrow")
        rec = {"wall_sec": round(wall, 1), "out_rows": out_rows}
        rec.update(part_hist(exploded, ["s"], derived_num_parts()))
        record("ngram", rec)

    if "snm" in want:
        # sorted-neighborhood blocking: the one range exchange IS the
        # cost model — probe the sort + single-pass window at 10^7 rows;
        # driver strip burden is 2(w-1) rows per batch, recorded below
        from relation_extraction_ray.functions.dedup import sorted_neighborhood_pairs

        if docs is None:
            t0 = time.time()
            docs = gen_docs(n, args.blocks).materialize()
            print(f"docs generated: {docs.count()} in {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        out_rows = sorted_neighborhood_pairs(docs, "text", "doc_id").count()
        wall = time.time() - t0
        record(
            "snm",
            {
                "wall_sec": round(wall, 1),
                "out_rows": out_rows,
                "driver_strip_rows_per_batch": 8,
            },
        )

    if "relstats" in want:
        # the per-key fold family: survival_km (one user-keyed exchange
        # + calendar-bounded histogram) and fd_audit (distinct-pair
        # exchange + counter folds) at 10^7 events-shaped rows
        import ray.data as rd

        from relation_extraction_ray.functions.joins import _mix64
        from relation_extraction_ray.functions.relational import fd_audit, survival_km

        def gen_ev(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy().astype(np.int64)
            day = (_mix64(ids.astype(np.uint64)) % 2400).astype("datetime64[D]")
            return pa.table(
                {
                    "user_id": pa.array(ids % 100_000, pa.int64()),
                    "ts": pa.array(day.astype("datetime64[us]")),
                    "det": pa.array(ids % 1_000_000, pa.int64()),
                    "dep": pa.array(
                        (_mix64((ids + 7).astype(np.uint64)) % 50).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )

        t0 = time.time()
        ev = (
            rd.range(n, override_num_blocks=args.blocks)
            .map_batches(gen_ev, batch_format="pyarrow")
            .materialize()
        )
        print(f"events generated: {ev.count()} in {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        km_rows = survival_km(ev, censor_window_days=90).count()
        km_wall = time.time() - t0
        t0 = time.time()
        fd = fd_audit([("ev.det->dep", ev, "det", "dep")])
        fd_wall = time.time() - t0
        record(
            "relstats",
            {
                "survival_wall_sec": round(km_wall, 1),
                "survival_rows": km_rows,
                "fd_wall_sec": round(fd_wall, 1),
                "fd_row": fd.to_pylist()[0],
            },
        )

    vecs = None
    if want & {"embed", "knn_lsh", "pq"}:
        t0 = time.time()
        vecs = gen_vecs(n, args.blocks).materialize()
        print(f"vectors generated: {vecs.count()} in {time.time()-t0:.0f}s", flush=True)

    if "embed" in want:
        from relation_extraction_ray.functions.ann import derived_planes_per_band

        t0 = time.time()
        out_rows = embed_neardup_pairs(vecs, threshold=0.9, dim=DIM, n_rows=n).count()
        wall = time.time() - t0
        ppb = derived_planes_per_band(n, cap=min(30, DIM))
        bucketed = vecs.map_batches(
            cached_stage_fn(
                BandedLshStage,
                (DIM, 8, ppb, True),
                {"dim": DIM, "bands": 8, "planes_per_band": ppb, "orthonormal": True},
            ),
            batch_format="pyarrow",
        )
        rec = {"wall_sec": round(wall, 1), "out_rows": out_rows, "planes_per_band": ppb}
        rec.update(part_hist(bucketed, ["band", "bucket"], derived_num_parts()))
        record("embed", rec)

    if "knn_lsh" in want:
        queries = list(range(0, n, max(1, n // 100)))[:100]
        t0 = time.time()
        out_rows = knn_lsh(vecs, queries, k=10, dim=DIM, n_rows=n).count()
        wall = time.time() - t0
        n_planes = derived_n_planes(n)
        bucketed = vecs.map_batches(
            cached_stage_fn(
                LshBucketStage, (DIM, n_planes), {"dim": DIM, "n_planes": n_planes}
            ),
            batch_format="pyarrow",
        )
        rec = {"wall_sec": round(wall, 1), "out_rows": out_rows, "n_planes": n_planes}
        rec.update(bucket_hist(bucketed))
        record("knn_lsh", rec)

    if "pq" in want:
        # the build/query split: codebooks (bounded sample), ONE encode scan
        # writing the 32x-compact code table, then queries that read codes
        # only; brute force over the same vectors is the comparison row
        from relation_extraction_ray.functions.ann import (
            knn_brute_force,
            knn_pq_over_codes,
            pq_codebooks,
            pq_encode,
        )

        t0 = time.time()
        books = pq_codebooks(vecs, m_sub=4, k=8, sample=4096)
        codes = pq_encode(vecs, books).materialize()
        build_wall = time.time() - t0
        q_ids = list(range(0, n, max(1, n // 100)))[:100]
        q_rows = vecs.filter(expr=" or ".join(f"vec_id == {q}" for q in q_ids)).take_all()
        queries = [(r["vec_id"], np.asarray(r["embedding"], np.float64)) for r in q_rows]
        t0 = time.time()
        out_rows = knn_pq_over_codes(codes, books, queries, k=10).count()
        query_wall = time.time() - t0
        t0 = time.time()
        brute_rows = knn_brute_force(vecs, q_ids, k=10).count()
        brute_wall = time.time() - t0
        record(
            "pq",
            {
                "build_wall_sec": round(build_wall, 1),
                "query_wall_sec": round(query_wall, 1),
                "brute_wall_sec": round(brute_wall, 1),
                "out_rows": out_rows,
                "brute_rows": brute_rows,
            },
        )

    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
