"""Mergeable cardinality sketches: HyperLogLog approximate distinct count.

The engine's exact count-distinct operators (``relational.distinct_texts``,
``relational.distinct_users_by_day``) carry one row per distinct value
through the exchange — the right answer when distinct cardinality is
bounded.  At 100 TB a column can hold 10^10+ distinct values; the scale
path is a MERGEABLE sketch: every batch folds into a fixed 2^p-byte
register array, the global reduce is an elementwise ``max`` (associative,
commutative, idempotent — retry-safe by construction), and nothing that
grows with cardinality ever crosses the object store or lands on the
driver.

Implementation is the 64-bit HyperLogLog of Flajolet et al. (2007) with
Heule et al. (2013)'s observation that a 64-bit hash needs no large-range
correction; linear counting handles the small range.  Hashing reuses the
engine's vectorized stable key hash (``joins.hash_columns`` — splitmix64 /
polynomial rolling, no per-row Python), so the sketch is deterministic
across processes and cluster sizes.

Error: standard deviation ~= 1.04 / sqrt(2^p); p=12 (4 KiB) gives ~1.6%.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import AggregateFn

from .joins import hash_columns

_U64 = np.uint64


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (float log2 rounds up at
    2^53+ and would bias the rank) — 6-step binary search on bits."""
    x = w.astype(np.uint64, copy=True)
    bl = np.zeros(x.shape, np.uint64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = _U64(shift)
        big = x >= (_U64(1) << s)
        bl[big] += s
        x[big] >>= s
    return bl + (x != 0)


def hll_fold(regs: np.ndarray, hashes: np.ndarray, p: int) -> np.ndarray:
    """Fold a batch of uint64 hashes into ``regs`` (2^p uint8) in place:
    bucket = top p bits, rank = leading-zero count of the 64-p suffix + 1."""
    q = _U64(64 - p)
    bucket = (hashes >> q).astype(np.int64)
    w = hashes & ((_U64(1) << q) - _U64(1))
    rho = (q - _bit_length_u64(w) + _U64(1)).astype(np.uint8)
    np.maximum.at(regs, bucket, rho)
    return regs


def hll_registers(
    ds: ray.data.Dataset, cols: list[str], p: int = 12
) -> np.ndarray:
    """Merged HLL register array for the distinct tuples of ``cols``.

    One streaming pass: per-block fold (vectorized), elementwise-max
    combine/merge via :class:`AggregateFn` — the exchange carries exactly
    one 2^p-byte array per block regardless of row count or cardinality."""
    m = 1 << p

    def acc_block(regs: np.ndarray, block) -> np.ndarray:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return regs
        return hll_fold(regs.copy(), hash_columns(block, cols), p)

    agg = AggregateFn(
        init=lambda k: np.zeros(m, np.uint8),
        merge=lambda a, b: np.maximum(a, b),
        accumulate_block=acc_block,
        name="hll_regs",
    )
    out = ds.select_columns(cols).aggregate(agg)
    return np.asarray(out["hll_regs"], dtype=np.uint8)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected cardinality estimate from a register array (64-bit
    variant: linear counting below 2.5m, no large-range correction)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def approx_distinct(ds: ray.data.Dataset, cols: list[str], p: int = 12) -> int:
    """Approximate COUNT(DISTINCT cols) — rounded HLL estimate."""
    return int(round(hll_estimate(hll_registers(ds, cols, p))))


def hll_estimate_exact_form(regs: np.ndarray) -> tuple[int, int]:
    """(est_milli, n_zero_regs) from a register array in the
    cross-engine-replayable fixed form.

    :func:`hll_estimate`'s ``np.sum(np.exp2(-regs))`` is a pairwise float
    sum whose rounding depends on summation order — a SQL engine cannot
    replay it bit-for-bit.  Here the harmonic-mean denominator is folded
    EXACTLY in integers first (``S = Σ 2^(63-ρ)``, a Python int ≤ m·2^63;
    every term is a power of two so nothing rounds), and only then does
    ONE fixed sequence of IEEE-double ops produce the estimate — the same
    sequence a DuckDB oracle writes literally.  The small-range branch
    uses ``math.log`` (bit-identical to DuckDB ``ln`` on this libm, the
    cat_dependence precedent; numpy's SIMD log is 1 ulp off ~20% of the
    time)."""
    import math

    m = len(regs)
    counts = np.bincount(np.asarray(regs, np.uint8), minlength=64)
    S = sum(int(c) << (63 - r) for r, c in enumerate(counts.tolist()) if c)
    zeros = int(counts[0])
    alpha = 0.7213 / (1.0 + 1.079 / m)  # m >= 128 branch of hll_estimate
    est = alpha * m * m * float(1 << 63) / float(S)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting, small range
    return int(math.floor(est * 1000.0)), zeros


def hll_distinct_audit(
    sources: list[tuple[str, ray.data.Dataset, str]], p: int = 12
) -> pa.Table:
    """Approximate-vs-exact distinct audit: one row per (label, dataset,
    key column) source with the HLL estimate (integer-milli, fixed
    cross-engine form) beside the true distinct count.

    Scale shape: the sketch side is the 100-TB path — one streaming pass
    per source, a single 2^p-byte register array per block across the
    exchange, elementwise-max reduce (``hll_registers``).  The exact side
    is the audit column: a groupby whose exchange carries one row per
    distinct key — fine for the integer keys audited here, and exactly
    the cost the sketch exists to avoid on unbounded-cardinality columns."""
    labels, est_milli, zero_regs, true_n = [], [], [], []
    for label, ds, col in sources:
        em, z = hll_estimate_exact_form(hll_registers(ds, [col], p))
        tn = ds.select_columns([col]).groupby(col).count().count()
        labels.append(label)
        est_milli.append(em)
        zero_regs.append(z)
        true_n.append(int(tn))
    return pa.table(
        {
            "source": pa.array(labels, pa.string()),
            "est_milli": pa.array(est_milli, pa.int64()),
            "n_zero_regs": pa.array(zero_regs, pa.int64()),
            "true_distinct": pa.array(true_n, pa.int64()),
        }
    ).sort_by("source")


def approx_distinct_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_cols: list[str],
    p: int = 12,
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT value_cols) per group — the sketch-sized
    scale path beside the exact pair-shuffle (``distinct_users_by_day``):
    per-batch partial fold produces ONE 2^p-byte register row per (group,
    batch), the groupby reduces registers with elementwise max, and the
    finalize emits the HLL estimate.  Exchange volume is groups × batches
    sketch rows, independent of value cardinality."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], batch.schema.field(group_col).type),
                 "regs": pa.array([], pa.binary())}
            )
        keys = batch.column(group_col)
        # dense-code groups within the batch, fold each group's hashes
        # into its own register row
        codes_arr = pc.dictionary_encode(keys.combine_chunks())
        idx = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_groups = len(codes_arr.dictionary)
        hashes = hash_columns(batch, value_cols)
        regs = np.zeros((n_groups, m), np.uint8)
        q = _U64(64 - p)
        bucket = (hashes >> q).astype(np.int64)
        w = hashes & ((_U64(1) << q) - _U64(1))
        rho = (q - _bit_length_u64(w) + _U64(1)).astype(np.uint8)
        np.maximum.at(regs, (idx, bucket), rho)
        return pa.table(
            {
                group_col: codes_arr.dictionary,
                "regs": pa.array([r.tobytes() for r in regs], pa.binary()),
            }
        )

    def acc_block(acc: np.ndarray, block) -> np.ndarray:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        out = acc.copy()
        for b in block.column("regs").to_pylist():
            out = np.maximum(out, np.frombuffer(b, np.uint8))
        return out

    agg = AggregateFn(
        init=lambda k: np.zeros(m, np.uint8),
        merge=lambda a, b: np.maximum(a, b),
        accumulate_block=acc_block,
        name="regs_merged",
        finalize=lambda regs: int(round(hll_estimate(np.asarray(regs, np.uint8)))),
    )
    out = ds.map_batches(partial, batch_format="pyarrow").groupby(group_col).aggregate(agg)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([group_col, "n_distinct_approx"])

    return out.map_batches(rename, batch_format="pyarrow").sort(group_col)


# --- count-min sketch (mergeable approximate frequencies) -------------------

#: CMS geometry: d rows × w buckets.  The d row-buckets come from disjoint
#: 16-bit slices of ONE md5-derived 64-bit token hash (one hash per
#: distinct token per batch instead of d), so the whole sketch has an
#: exact SQL replay via the same ``'0x'||substr(md5(...),1,16)`` fragment
#: every md5-keyed oracle uses.  4 × 1024 × 8 B = 32 KiB per block —
#: exchange volume independent of vocabulary size.
CMS_D, CMS_W = 4, 1024


def _cms_buckets(tokens: list[str]) -> np.ndarray:
    """[n, d] bucket matrix: bucket_j = ((md5_u64('cms:'+t) >> 16j) &
    0xFFFF) % w.  One md5 per token; slice extraction is vectorized."""
    import hashlib

    h = np.array(
        [int(hashlib.md5(("cms:" + t).encode()).hexdigest()[:16], 16) for t in tokens],
        dtype=np.uint64,
    )
    out = np.empty((len(tokens), CMS_D), dtype=np.int64)
    for j in range(CMS_D):
        out[:, j] = ((h >> _U64(16 * j)) & _U64(0xFFFF)).astype(np.int64) % CMS_W
    return out


def cms_sketch(
    ds: ray.data.Dataset, text_col: str = "text"
) -> np.ndarray:
    """Merged count-min sketch (Cormode & Muthukrishnan, 2005) of the
    corpus token-frequency distribution — the mergeable scale path beside
    the exact ``heavy_hitters`` two-scan: per-block fold into a fixed
    d × w int64 matrix, elementwise-SUM merge (associative, commutative),
    nothing cardinality-sized crosses the object store.  Guarantee:
    ``true ≤ est ≤ true + εN`` with prob ≥ 1-δ for ε = e/w, δ = e^-d.

    The per-batch md5 loop runs once per DISTINCT token per batch (the
    value_counts pre-combine); a throughput-critical deployment would swap
    in the vectorized splitmix hash at the cost of the SQL-replayable
    oracle."""
    from .text import _split_lower

    def acc_block(counts: np.ndarray, block) -> np.ndarray:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return counts
        toks = pc.list_flatten(_split_lower(block.column(text_col)))
        vc = toks.value_counts()
        vals = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = [i for i, v in enumerate(vals) if v != ""]
        if not keep:
            return counts
        vals = [vals[i] for i in keep]
        cnts = cnts[keep]
        b = _cms_buckets(vals)
        out = counts.copy()
        for j in range(CMS_D):
            np.add.at(out[j], b[:, j], cnts)
        return out

    agg = AggregateFn(
        init=lambda k: np.zeros((CMS_D, CMS_W), np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        name="cms",
    )
    out = ds.select_columns([text_col]).aggregate(agg)
    return np.asarray(out["cms"], dtype=np.int64).reshape(CMS_D, CMS_W)


def cms_estimate(counts: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point-query estimates for ``tokens``: min over the d row cells."""
    b = _cms_buckets(tokens)
    return np.min(
        np.stack([counts[j, b[:, j]] for j in range(CMS_D)]), axis=0
    ).astype(np.int64)


# --- Bloom filter: mergeable approximate membership ---------------------------

BLOOM_M = 65536  # bits (8 KiB of words per sketch)
BLOOM_K = 4


def _bloom_positions(keys: list[str]) -> np.ndarray:
    """[n, k] bit positions via Kirsch-Mitzenmacher double hashing:
    ``pos_j = (h1 + j·h2) mod m`` with h1/h2 = the two 64-bit halves of
    one md5 per key — one digest per key, and the whole position rule is
    replayable in SQL UBIGINT arithmetic (mod-m first, so nothing
    overflows)."""
    import hashlib

    h1 = np.empty(len(keys), np.uint64)
    h2 = np.empty(len(keys), np.uint64)
    for i, s in enumerate(keys):
        d = hashlib.md5(("bloom:" + s).encode()).hexdigest()
        h1[i] = int(d[:16], 16)
        h2[i] = int(d[16:32], 16)
    m = _U64(BLOOM_M)
    out = np.empty((len(keys), BLOOM_K), np.int64)
    for j in range(BLOOM_K):
        out[:, j] = ((h1 % m + _U64(j) * (h2 % m)) % m).astype(np.int64)
    return out


def bloom_sketch(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """Merged Bloom filter (Bloom, 1970) over a key column — the
    mergeable membership sketch beside HLL (distinct) and CMS
    (frequency): per-block fold into a fixed 2^16-bit word array,
    bitwise-OR merge (associative, commutative, IDEMPOTENT — retry-safe
    by construction), 8 KiB per block across the exchange at any key
    cardinality.  No false negatives ever; false-positive rate
    ≈ (1 - e^{-kn/m})^k and — because every bit is md5-derived — the
    false positives themselves are deterministic and SQL-replayable."""

    def acc_block(words: np.ndarray, block) -> np.ndarray:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return words
        keys = [str(v) for v in block.column(col).unique().to_pylist()]
        if not keys:
            return words
        pos = _bloom_positions(keys).reshape(-1)
        out = words.copy()
        np.bitwise_or.at(out, pos // 64, _U64(1) << (pos % 64).astype(np.uint64))
        return out

    agg = AggregateFn(
        init=lambda k: np.zeros(BLOOM_M // 64, np.uint64),
        merge=np.bitwise_or,
        accumulate_block=acc_block,
        name="bloom",
    )
    out = ds.select_columns([col]).aggregate(agg)
    return np.asarray(out["bloom"], dtype=np.uint64).reshape(BLOOM_M // 64)


def bloom_contains(words: np.ndarray, keys: list[str]) -> np.ndarray:
    """Vectorized membership probe: True iff all k bits are set."""
    if not keys:
        return np.zeros(0, bool)
    pos = _bloom_positions(keys)
    bits = (words[pos // 64] >> (pos % 64).astype(np.uint64)) & _U64(1)
    return (bits == 1).all(axis=1)
