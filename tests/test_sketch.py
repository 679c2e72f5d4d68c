"""HyperLogLog approximate distinct count: accuracy envelope, exact
mergeability, determinism, grouped-hash consistency."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from relation_extraction_ray.functions.sketch import (
    approx_distinct,
    hll_estimate,
    hll_fold,
    hll_registers,
)
from relation_extraction_ray.functions.joins import hash_columns


def _ints_ds(vals, blocks=8):
    return ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(blocks)


@pytest.mark.parametrize("true_n", [100, 5_000, 60_000])
def test_hll_accuracy_envelope(ray_session, true_n):
    """p=12 → sigma ~= 1.625%; assert within 5 sigma (one-shot safe)."""
    rng = np.random.default_rng(123)
    vals = rng.integers(0, true_n, size=true_n * 3)  # heavy dups
    distinct = len(np.unique(vals))
    est = approx_distinct(_ints_ds(vals.tolist()), ["v"], p=12)
    rel_err = abs(est - distinct) / distinct
    assert rel_err < 5 * 1.04 / np.sqrt(4096), (est, distinct, rel_err)


def test_hll_merge_equals_union(ray_session):
    """max-merge of two sketches == sketch of the union, register-exact
    (the property that makes the distributed fold retry-safe)."""
    a = list(range(0, 3000))
    b = list(range(1500, 5000))
    ra = hll_registers(_ints_ds(a), ["v"], p=10)
    rb = hll_registers(_ints_ds(b), ["v"], p=10)
    ru = hll_registers(_ints_ds(a + b), ["v"], p=10)
    assert np.array_equal(np.maximum(ra, rb), ru)


def test_hll_deterministic_and_block_invariant(ray_session):
    """Same values → identical registers regardless of block layout
    (cluster-size independence of the sketch)."""
    vals = [f"doc-{i}" for i in range(4000)]
    t = pa.table({"v": pa.array(vals, pa.string())})
    r1 = hll_registers(ray.data.from_arrow(t).repartition(2), ["v"], p=11)
    r2 = hll_registers(ray.data.from_arrow(t).repartition(17), ["v"], p=11)
    assert np.array_equal(r1, r2)


def test_hll_fold_matches_scalar_reference():
    """Vectorized bucket/rank fold equals a per-hash Python reference."""
    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 2**63, size=500, dtype=np.int64).astype(np.uint64)
    p = 6
    got = hll_fold(np.zeros(1 << p, np.uint8), hashes, p)
    want = np.zeros(1 << p, np.uint8)
    for h in hashes.tolist():
        bucket = h >> (64 - p)
        w = h & ((1 << (64 - p)) - 1)
        rho = (64 - p) - w.bit_length() + 1
        want[bucket] = max(want[bucket], rho)
    assert np.array_equal(got, want)


def test_hll_string_column_accuracy(ray_session):
    """String keys go through the polynomial rolling hash — envelope holds."""
    vals = [f"user-{i % 9000}@example.com" for i in range(30_000)]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.string())})).repartition(6)
    est = approx_distinct(ds, ["v"], p=12)
    assert abs(est - 9000) / 9000 < 5 * 1.04 / np.sqrt(4096)


def test_grouped_hll_envelope_and_determinism(ray_session):
    """Per-group estimates within 5 sigma of exact; block-layout invariant."""
    import pandas as pd

    from relation_extraction_ray.functions.sketch import approx_distinct_by_group

    rng = np.random.default_rng(5)
    n = 60_000
    g = rng.integers(0, 4, size=n)          # 4 groups
    # distinct pools of very different sizes per group
    pools = [50, 800, 5_000, 20_000]
    v = np.array([int(rng.integers(0, pools[gi])) + gi * 10**7 for gi in g])
    t = pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(v, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(9)
    got = {r["g"]: r["n_distinct_approx"] for r in approx_distinct_by_group(ds, "g", ["v"], p=12).take_all()}
    df = pd.DataFrame({"g": g, "v": v})
    exact = df.groupby("g")["v"].nunique().to_dict()
    sigma = 1.04 / np.sqrt(4096)
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 5 * sigma, (k, got[k], e)

    got2 = {r["g"]: r["n_distinct_approx"] for r in approx_distinct_by_group(ds.repartition(2), "g", ["v"], p=12).take_all()}
    assert got == got2


# --- count-min sketch --------------------------------------------------------


def test_cms_never_undercounts_and_bounds_overcount(ray_session):
    from relation_extraction_ray.functions.sketch import (
        CMS_W,
        cms_estimate,
        cms_sketch,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab, size=40, p=_zipf_p(len(vocab))))
        for _ in range(400)
    ]
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(7)
    counts = cms_sketch(ds)
    exact = {}
    for t in texts:
        for w in t.split(" "):
            exact[w] = exact.get(w, 0) + 1
    n_total = sum(exact.values())
    probes = vocab[:50] + ["absent_token"]
    est = cms_estimate(counts, probes)
    for w, e in zip(probes, est):
        true = exact.get(w, 0)
        assert e >= true, (w, e, true)            # CMS never undercounts
        assert e <= true + 4 * (n_total / CMS_W), (w, e, true)  # loose eps bound
    assert est[-1] >= 0


def _zipf_p(n):
    p = 1.0 / np.arange(1, n + 1)
    return p / p.sum()


def test_cms_block_layout_invariance(ray_session):
    from relation_extraction_ray.functions.sketch import cms_sketch

    texts = [{"text": f"tok{i % 13} tok{i % 7} shared"} for i in range(200)]
    a = cms_sketch(ray.data.from_items(texts).repartition(1))
    b = cms_sketch(ray.data.from_items(texts).repartition(9))
    assert (a == b).all()
    assert a.sum() > 0


def test_bloom_no_false_negatives_and_low_fp(ray_session):
    from relation_extraction_ray.functions.sketch import bloom_contains, bloom_sketch

    members = [{"k": f"key{i}"} for i in range(2000)]
    words = bloom_sketch(ray.data.from_items(members).repartition(7), "k")
    present = bloom_contains(words, [f"key{i}" for i in range(2000)])
    assert present.all()  # a Bloom filter NEVER false-negatives
    absent = bloom_contains(words, [f"other{i}" for i in range(5000)])
    # m=65536, k=4, n=2000 -> fp ~ (1-e^(-kn/m))^4 ~ 1.2e-4
    assert absent.sum() <= 5


def test_bloom_merge_idempotent_and_block_invariant(ray_session):
    from relation_extraction_ray.functions.sketch import bloom_sketch

    rows = [{"k": f"v{i % 211}"} for i in range(1500)]  # heavy duplication
    a = bloom_sketch(ray.data.from_items(rows).repartition(1), "k")
    b = bloom_sketch(ray.data.from_items(rows).repartition(11), "k")
    assert (a == b).all()
    # idempotent: OR-ing the sketch with itself changes nothing
    assert (np.bitwise_or(a, a) == a).all()
    # distinct-only: same sketch as the deduplicated key set
    c = bloom_sketch(ray.data.from_items([{"k": f"v{i}"} for i in range(211)]), "k")
    assert (a == c).all()


def test_centroid_similarity_closed_forms(ray_session):
    """Centroid-pair cosine: identical classes → 1, orthogonal → 0,
    opposite → −1; scale invariance (cos of sums == cos of means);
    partitioning invariant."""
    import pyarrow as pa

    from relation_extraction_ray.functions.ann import centroid_similarity

    def vec(*v):
        return list(map(float, v))

    rows = [
        (0, vec(1, 0, 0, 0)), (0, vec(1, 0, 0, 0)),
        (1, vec(2, 0, 0, 0)),                       # same direction, 2× scale
        (2, vec(0, 1, 0, 0)),                       # orthogonal
        (3, vec(-1, 0, 0, 0)),                      # opposite
    ]
    t = pa.table(
        {
            "label": pa.array([r[0] for r in rows], pa.int32()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        }
    )
    for nb in (1, 3):
        got = {
            (r["label_a"], r["label_b"]): r["cos_nano"]
            for r in centroid_similarity(
                ray.data.from_arrow(t).repartition(nb)
            ).take_all()
        }
        assert got[(0, 1)] == 1_000_000_000   # scale cancels
        assert got[(0, 2)] == 0
        assert got[(0, 3)] == -1_000_000_000
        assert got[(2, 3)] == 0
        assert len(got) == 6


def test_cluster_scatter_closed_forms(ray_session):
    """Cluster scatter: a tight pair has intra 0 and a far singleton
    intra 0; separation is the squared centroid distance in micro²
    units; nearest picks the closer centroid with ties by label;
    partitioning invariant."""
    import pyarrow as pa

    from relation_extraction_ray.functions.ann import cluster_scatter

    U = 1_000_000  # one unit in micro
    rows = [
        (0, [0.0, 0.0]), (0, [0.0, 0.0]),     # tight at origin
        (1, [3.0, 0.0]),                       # 3 units right
        (2, [0.0, 4.0]),                       # 4 units up
        (3, [1.0, 0.0]), (3, [-1.0, 0.0]),     # centroid origin, intra 1
    ]
    t = pa.table(
        {
            "label": pa.array([r[0] for r in rows], pa.int32()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        }
    )
    for nb in (1, 3):
        got = {
            r["label"]: r
            for r in cluster_scatter(
                ray.data.from_arrow(t).repartition(nb)
            ).take_all()
        }
        assert got[0]["intra_scaled"] == 0
        assert got[3]["intra_scaled"] == U * U            # mean |v−c|² = 1²
        # label 0 centroid origin: dists² 9, 16, 0 → nearest label 3
        assert got[0]["nearest_label"] == 3 and got[0]["sep_scaled"] == 0
        # label 1 (3,0): to 0 → 9; to 2 → 25; to 3 → 9 → tie, lower label
        assert got[1]["nearest_label"] == 0
        assert got[1]["sep_scaled"] == 9 * U * U


def test_hll_exact_form_matches_float_estimate(ray_session):
    """The SQL-replayable fixed form (exact-integer harmonic denominator,
    one IEEE op sequence) tracks hll_estimate within 1 milli across both
    branches — the float np.sum it replaces is order-dependent but its
    terms are powers of two, so the two totals differ by < 1 ulp-ish."""
    from relation_extraction_ray.functions.sketch import (
        hll_estimate_exact_form,
    )

    for n in (200, 30_000):  # linear-counting branch, raw-HLL branch
        regs = hll_registers(_ints_ds(list(range(n))), ["v"], p=12)
        est_milli, zeros = hll_estimate_exact_form(regs)
        ref = hll_estimate(regs)
        assert abs(est_milli / 1000.0 - ref) <= max(1e-6 * ref, 2e-3)
        assert zeros == int(np.count_nonzero(regs == 0))


def test_hll_audit_rows(ray_session):
    """End-to-end audit table: labels, exact counts, estimate envelope."""
    from relation_extraction_ray.functions.sketch import hll_distinct_audit

    vals = list(range(2000)) * 3
    t = hll_distinct_audit([("t.v", _ints_ds(vals), "v")])
    assert t.column("source").to_pylist() == ["t.v"]
    assert t.column("true_distinct").to_pylist() == [2000]
    est = t.column("est_milli").to_pylist()[0] / 1000.0
    assert abs(est - 2000) / 2000 < 5 * 1.04 / np.sqrt(4096)


def test_pca_top_matches_numpy_and_blocks(ray_session):
    """Power iteration converges to numpy's dominant covariance
    eigenvector (|cos| > 0.999 on a well-separated spectrum) with the
    eigenvalue within rounding; block-invariant."""
    from relation_extraction_ray.functions.ann import pca_top

    rng = np.random.default_rng(5)
    base = rng.normal(0, 0.05, size=(400, 8))
    axis = np.array([1.0, -2.0, 0.5, 0, 0, 1.0, 0, 0.25])
    axis /= np.linalg.norm(axis)
    data = (base + rng.normal(0, 1.0, size=(400, 1)) * axis).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in data],
                                  pa.list_(pa.float32())),
        }
    )
    a = pca_top(ray.data.from_arrow(t).repartition(1)).take_all()
    b = pca_top(ray.data.from_arrow(t).repartition(7)).take_all()
    assert a == b
    v = np.array([r["v_scaled"] for r in a], np.float64)
    micro = np.floor(data.astype(np.float64) * 1e6 + 0.5)
    cov = np.cov(micro, rowvar=False, bias=True)
    w_np, v_np = np.linalg.eigh(cov)
    top = v_np[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, cos
    # eig_nano is in embedding² units: numpy top eigenvalue / 1e12
    eig = a[0]["eig_nano"] / 1e9
    assert abs(eig - w_np[-1] / 1e12) / (w_np[-1] / 1e12) < 0.01
