"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference writes duplicate SDPs freely (SURVEY.md §2.7); a 100 TB
training-data pipeline cannot.  Patterns:

* **exact** — content-hash column in a vectorized ``map_batches``, per-batch
  partial combine, then one ``groupby(hash)`` reduce (keeper = min doc_id).
* **MinHash LSH** — shingle → minhash signature per batch → explode to
  (band, bucket) rows → ``groupby`` buckets → candidate pairs → exact
  Jaccard verify.  Only bucket rows shuffle, never documents.
* **SimHash** — 64-bit rotation-invariant hash per doc; near-dups share
  Hamming-close keys (bucketed by prefix for the scale path).

All hashing is blake2b-based and PYTHONHASHSEED-independent, so results are
identical at any parallelism level.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_MERSENNE = (1 << 61) - 1


def _stable_hash64(token: str) -> int:
    return int.from_bytes(hashlib.blake2b(token.encode(), digest_size=8).digest(), "big")


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_set(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.lower().split(" ") if t]
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def exact_dedup(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Exact duplicate groups: md5(text) → (h, keeper=min doc_id, n dups).
    Per-batch partial combine bounds the shuffle by distinct hashes/batch."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column("doc_id").to_pylist()
        best: dict[str, list] = {}
        for i, t in zip(ids, texts):
            h = hashlib.md5(t.encode()).hexdigest()
            e = best.setdefault(h, [i, 0])
            e[0] = min(e[0], i)
            e[1] += 1
        return pa.Table.from_pydict(
            {
                "h": list(best.keys()),
                "keeper": pa.array([v[0] for v in best.values()]),
                "n": pa.array([v[1] for v in best.values()], pa.int64()),
            }
        )

    g = docs.map_batches(partial, batch_format="pyarrow").groupby("h")
    return g.aggregate(
        ray.data.aggregate.Min("keeper", alias_name="keeper"),
        ray.data.aggregate.Sum("n", alias_name="n"),
    )


class MinHashStage:
    """Actor-pool stage: doc → LSH band rows. Permutation parameters are
    built once per actor in ``__init__`` (same seed everywhere →
    deterministic signatures)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3, seed: int = 1) -> None:
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm, seed)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray | None:
        shingles = shingle_set(text, self.shingle_n)
        if not shingles:
            return None
        hs = np.array([_stable_hash64(s) for s in shingles], dtype=np.uint64) % _MERSENNE
        # [S, P] permuted hashes -> column min = signature
        vals = (hs[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {"band": [], "bucket": [], "doc_id": []}
        for doc_id, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            sig = self.signature(text)
            if sig is None:
                continue
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bucket = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out["band"].append(band)
                out["bucket"].append(bucket)
                out["doc_id"].append(doc_id)
        return pa.Table.from_pydict(
            {
                "band": pa.array(out["band"], pa.int32()),
                "bucket": pa.array(out["bucket"], pa.string()),
                "doc_id": pa.array(out["doc_id"]),
            }
        )


def minhash_candidate_pairs(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """LSH candidate duplicate pairs (doc_a < doc_b), deduplicated across
    bands by a count-aggregate (not per-pair ``map_groups`` — pair groups
    have size ≤ #bands, so per-group Python would dominate).  ``max_bucket``
    caps degenerate buckets (all-identical spam) against quadratic blowup —
    the cap is the documented coverage bound."""

    def pairs_of(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))[:max_bucket]
        a_col, b_col = [], []
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                a_col.append(ids[i])
                b_col.append(ids[j])
        return pa.Table.from_pydict({"doc_a": pa.array(a_col), "doc_b": pa.array(b_col)})

    bands_ds = docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_n": shingle_n},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    cand = bands_ds.groupby(["band", "bucket"]).map_groups(pairs_of, batch_format="pyarrow")
    # distinct pairs across bands: aggregate + project (vectorized)
    distinct = cand.groupby(["doc_a", "doc_b"]).aggregate(
        ray.data.aggregate.Count(alias_name="n_bands")
    )
    return distinct.select_columns(["doc_a", "doc_b"])


def verify_jaccard(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard verification of candidate pairs.  The text
    lookup side is broadcast via ``ray.put`` (one object, zero-copy reads)
    — valid while the corpus fits the object store; at 10^12 docs this
    becomes a hash-partitioned join on doc_id instead."""
    texts = {}
    for b in docs.select_columns(["doc_id", "text"]).iter_batches(batch_format="pyarrow"):
        texts.update(zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()))
    ref = ray.put(texts)

    class Verify:
        def __init__(self) -> None:
            self.texts = ray.get(ref)
            self._cache: dict = {}

        def _shingles(self, doc_id) -> set[str]:
            s = self._cache.get(doc_id)
            if s is None:
                s = self._cache[doc_id] = shingle_set(self.texts[doc_id], shingle_n)
            return s

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep_a, keep_b, sims = [], [], []
            for a, b in zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()):
                sa, sb = self._shingles(a), self._shingles(b)
                union = len(sa | sb)
                sim = (len(sa & sb) / union) if union else 0.0
                if sim >= threshold:
                    keep_a.append(a)
                    keep_b.append(b)
                    sims.append(round(sim, 6))
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array(keep_a),
                    "doc_b": pa.array(keep_b),
                    "jaccard": pa.array(sims, pa.float64()),
                }
            )

    return pairs.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 4))


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace unigram features."""
    toks = [t for t in text.lower().split(" ") if t]
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok, cnt in Counter(toks).items():
        h = _stable_hash64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), cnt, -cnt)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_table(docs: ray.data.Dataset, prefix_bits: int = 16) -> ray.data.Dataset:
    """doc_id → (simhash, prefix bucket).  Near-dup candidates share a
    prefix bucket; a follow-up per-bucket Hamming scan stays local."""

    def sh(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(hs, pa.uint64()),
                "bucket": pa.array([h >> (64 - prefix_bits) for h in hs], pa.uint32()),
            }
        )

    return docs.map_batches(sh, batch_format="pyarrow")
