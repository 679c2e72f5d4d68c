"""Distributed integer PageRank vs a single-process Python reference."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest

import ray

from relation_extraction_ray.functions.graph import SCALE, pagerank

ROWS = [
    ("a", "p1", "b", 3), ("a", "p2", "b", 2), ("a", "p1", "c", 5),
    ("b", "p1", "c", 1), ("c", "p1", "a", 4), ("c", "p1", "d", 1),
    ("d", "p1", "d", 2),          # self loop
    ("e", "p1", "a", 1),          # source-only node
    ("f", "p1", "g", 1),          # isolated pair; g dangling
]


def _adj(rows):
    return pa.table(
        {
            "src_id": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "dst_id": [r[2] for r in rows],
            "weight": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _reference(rows, iters):
    ew = defaultdict(int)
    for u, _, v, w in rows:
        ew[(u, v)] += w
    nodes = sorted({u for u, _ in ew} | {v for _, v in ew})
    ow = defaultdict(int)
    for (u, _), w in ew.items():
        ow[u] += w
    rank = {n: SCALE for n in nodes}
    for _ in range(iters):
        contrib = defaultdict(int)
        for (u, v), w in ew.items():
            contrib[v] += rank[u] * w // ow[u]
        rank = {n: 15 * SCALE // 100 + 85 * contrib[n] // 100 for n in nodes}
    return sorted(((r, n) for n, r in rank.items()), key=lambda t: (-t[0], t[1]))


@pytest.mark.parametrize("iters", [1, 4])
def test_pagerank_matches_reference(ray_session, iters):
    ds = ray.data.from_arrow(_adj(ROWS)).repartition(3)
    got = [(int(r.rank), r.node) for r in pagerank(ds, iters=iters).to_pandas().itertuples()]
    assert got == _reference(ROWS, iters)


def test_pagerank_block_invariant(ray_session):
    """Identical ranks regardless of input block layout (integer
    arithmetic makes the reduce order-independent)."""
    a = pagerank(ray.data.from_arrow(_adj(ROWS)).repartition(1), iters=3).to_pandas()
    b = pagerank(ray.data.from_arrow(_adj(ROWS)).repartition(9), iters=3).to_pandas()
    assert a.equals(b)


def test_pagerank_larger_random_graph(ray_session):
    """200-node random multigraph: exact vs reference."""
    rng = np.random.default_rng(11)
    rows = [
        (f"n{int(rng.integers(200))}", "p", f"n{int(rng.integers(200))}", int(rng.integers(1, 5)))
        for _ in range(1500)
    ]
    ds = ray.data.from_arrow(_adj(rows)).repartition(5)
    got = [(int(r.rank), r.node) for r in pagerank(ds, iters=3).to_pandas().itertuples()]
    assert got == _reference(rows, 3)


def _ref_triangles(rows):
    import itertools

    E = set()
    for u, _, v, _ in rows:
        if u != v:
            E.add((min(u, v), max(u, v)))
    nodes = sorted({x for e in E for x in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in E and (b, c) in E and (a, c) in E
    )


def test_triangle_count_random_graph(ray_session):
    rng = np.random.default_rng(3)
    rows = [
        (f"n{int(rng.integers(40))}", "p", f"n{int(rng.integers(40))}", 1)
        for _ in range(300)
    ]
    from relation_extraction_ray.functions.graph import triangle_count

    got = triangle_count(ray.data.from_arrow(_adj(rows)).repartition(4)).to_pandas()
    assert int(got["n_triangles"][0]) == _ref_triangles(rows)


def test_triangle_count_star_skew_and_directions(ray_session):
    """A 50-leaf hub emits zero wedges under degree orientation; reversed
    duplicate directed edges collapse to one undirected edge."""
    from relation_extraction_ray.functions.graph import triangle_count

    rows = [("hub", "p", f"leaf{i}", 1) for i in range(50)]
    rows += [("x", "p", "y", 1), ("y", "p", "x", 2), ("y", "p", "z", 1), ("x", "p", "z", 1)]
    got = triangle_count(ray.data.from_arrow(_adj(rows)).repartition(3)).to_pandas()
    assert int(got["n_triangles"][0]) == 1


def test_pagerank_pinned_equals_union_path(ray_session):
    """pin_bytes_bound=0 forces the re-union fallback; both paths must be
    bit-identical (integer arithmetic, same partition function)."""
    from relation_extraction_ray.functions.graph import pagerank

    ds = ray.data.from_arrow(_adj(ROWS)).repartition(3)
    pinned = pagerank(ds, iters=3).to_pandas()
    union = pagerank(ds, iters=3, pin_bytes_bound=0).to_pandas()
    assert pinned.equals(union)


def _ref_edge_jaccard(rows):
    import collections

    E = set()
    for u, _, v, _ in rows:
        if u != v:
            E.add((min(u, v), max(u, v)))
    nbrs = collections.defaultdict(set)
    for a, b in E:
        nbrs[a].add(b)
        nbrs[b].add(a)
    out = []
    for a, b in sorted(E):
        cn = len(nbrs[a] & nbrs[b])
        da, db = len(nbrs[a]), len(nbrs[b])
        out.append((a, b, da, db, cn, int(np.floor(cn * 1000000.0 / (da + db - cn) + 0.5))))
    return out


def test_edge_jaccard_random_graph(ray_session):
    rng = np.random.default_rng(3)
    rows = [
        (f"n{int(rng.integers(40))}", "p", f"n{int(rng.integers(40))}", 1)
        for _ in range(300)
    ]
    from relation_extraction_ray.functions.graph import edge_jaccard

    got = (
        edge_jaccard(ray.data.from_arrow(_adj(rows)).repartition(4))
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got.itertuples(index=False)] == _ref_edge_jaccard(rows)


def test_edge_jaccard_star_and_triangle(ray_session):
    """Hub-star edges have zero common neighbors (LEFT semantics keep them);
    the one triangle credits all three of its edges."""
    from relation_extraction_ray.functions.graph import edge_jaccard

    rows = [("hub", "p", f"leaf{i}", 1) for i in range(30)]
    rows += [("x", "p", "y", 1), ("y", "p", "x", 2), ("y", "p", "z", 1), ("x", "p", "z", 1)]
    got = (
        edge_jaccard(ray.data.from_arrow(_adj(rows)).repartition(3))
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got.itertuples(index=False)] == _ref_edge_jaccard(rows)
    tri = got[got.n_common > 0]
    assert len(tri) == 3 and set(tri.n_common) == {1}


def _kcore_ref(edges, k):
    """Brute-force peel: repeatedly drop nodes with degree < k."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg = defaultdict(int)
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        dead = {n for n, d in deg.items() if d < k}
        if not dead:
            return sorted(deg.items())
        es = {e for e in es if e[0] not in dead and e[1] not in dead}


def test_kcore_chain_clique_and_bridge(ray_session):
    from relation_extraction_ray.functions.graph import kcore

    # 4-clique (every node deg 3) + a chain hanging off it + a self loop
    rows = [
        ("k1", "p", "k2", 1), ("k1", "p", "k3", 1), ("k1", "p", "k4", 1),
        ("k2", "p", "k3", 1), ("k2", "p", "k4", 1), ("k3", "p", "k4", 1),
        ("k4", "p", "c1", 1), ("c1", "p", "c2", 1), ("c2", "p", "c3", 1),
        ("z", "p", "z", 1),
    ]
    ds = ray.data.from_arrow(_adj(rows)).repartition(3)
    got = [(r["node"], r["deg"]) for r in kcore(ds, k=2).take_all()]
    assert got == [("k1", 3), ("k2", 3), ("k3", 3), ("k4", 3)]
    # k=3: the clique survives intact; k=4: nothing survives
    got3 = [(r["node"], r["deg"]) for r in kcore(ds, k=3).take_all()]
    assert got3 == [("k1", 3), ("k2", 3), ("k3", 3), ("k4", 3)]
    assert kcore(ds, k=4).take_all() == []


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_random_graph_vs_bruteforce(ray_session, k):
    from relation_extraction_ray.functions.graph import kcore

    rng = np.random.default_rng(17)
    n = 60
    edges = [
        (f"n{int(rng.integers(n))}", f"n{int(rng.integers(n))}") for _ in range(150)
    ]
    rows = [(a, "p", b, 1) for a, b in edges]
    ds = ray.data.from_arrow(_adj(rows)).repartition(5)
    got = [(r["node"], r["deg"]) for r in kcore(ds, k=k, max_rounds=32).take_all()]
    assert got == _kcore_ref(edges, k)


def test_kcore_block_invariant(ray_session):
    from relation_extraction_ray.functions.graph import kcore

    rng = np.random.default_rng(5)
    rows = [
        (f"n{int(rng.integers(25))}", "p", f"n{int(rng.integers(25))}", 1)
        for _ in range(60)
    ]
    outs = []
    for nb in (1, 6):
        ds = ray.data.from_arrow(_adj(rows)).repartition(nb)
        outs.append([(r["node"], r["deg"]) for r in kcore(ds, k=2).take_all()])
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_degree_histogram_vs_bruteforce(ray_session):
    from relation_extraction_ray.functions.graph import degree_histogram

    rng = np.random.default_rng(3)
    rows = [
        (f"n{int(rng.integers(30))}", "p", f"n{int(rng.integers(30))}", 1)
        for _ in range(80)
    ]
    ds = ray.data.from_arrow(_adj(rows)).repartition(4)
    got = [(r["deg"], r["n_nodes"]) for r in degree_histogram(ds).take_all()]
    es = {tuple(sorted((a, b))) for a, _, b, _ in rows if a != b}
    deg = defaultdict(int)
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    hist = defaultdict(int)
    for d in deg.values():
        hist[d] += 1
    assert got == sorted(hist.items())
    assert sum(n for _, n in got) == len(deg)


def test_pred_bigrams_vs_bruteforce(ray_session):
    from relation_extraction_ray.functions.graph import pred_bigrams

    rng = np.random.default_rng(7)
    rows = [
        (
            f"n{int(rng.integers(15))}",
            f"p{int(rng.integers(4))}",
            f"n{int(rng.integers(15))}",
            1,
        )
        for _ in range(60)
    ]
    # adjacency semantics: rows unique per (src, pred, dst)
    rows = sorted({(a, p, b) for a, p, b, _ in rows})
    rows = [(a, p, b, 1) for a, p, b in rows]
    ds = ray.data.from_arrow(_adj(rows)).repartition(4)
    got = [(r["p1"], r["p2"], r["n_paths"]) for r in pred_bigrams(ds).take_all()]
    want = defaultdict(int)
    for a1, p1, b1, _ in rows:
        for a2, p2, b2, _ in rows:
            if a2 == b1:
                want[(p1, p2)] += 1
    assert got == sorted((p1, p2, n) for (p1, p2), n in want.items())


def test_pred_bigrams_hub_no_enumeration_blowup(ray_session):
    from relation_extraction_ray.functions.graph import pred_bigrams

    # star hub: 200 in-edges x 200 out-edges = 40,000 paths but only ONE
    # output row (pa, pb) — the cross product is of tallies, not paths
    rows = [(f"i{i}", "pa", "hub", 1) for i in range(200)] + [
        ("hub", "pb", f"o{i}", 1) for i in range(200)
    ]
    ds = ray.data.from_arrow(_adj(rows)).repartition(3)
    got = [(r["p1"], r["p2"], r["n_paths"]) for r in pred_bigrams(ds).take_all()]
    assert got == [("pa", "pb", 40000)]
