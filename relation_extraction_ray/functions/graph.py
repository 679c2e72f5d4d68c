"""Graph analytics over the constructed KG: distributed PageRank.

The engine's terminal KG artifact is the adjacency table
(``pipelines/kg.adjacency_from_triples`` — SURVEY.md A7/J7); ranking its
entities is the canonical downstream consumer of a KG-construction
pipeline.  PageRank here is expressed Ray-Data-first in the classic
2-exchanges-per-iteration shape:

1. **Static edge prep (once)**: predicates collapse to (u, v, w) edge
   weights via per-batch partial combine + one groupby; edges then hash-
   partition by source ``u`` and — because ALL of u's out-edges land in
   u's partition — the out-weight ``ow(u)`` is computed locally with a
   segmented sum, never through an extra exchange.  The prepped edge
   partitions are materialized once and reused by every iteration
   (static graph, iterating ranks).
2. **Per iteration**: ranks exchange ONCE (same hash, same partition ids
   as the edges), the per-partition probe is a vectorized sorted-array
   ``searchsorted`` join emitting (v, contrib) rows, and one groupby(v)
   sums contributions; dangling/unreferenced nodes are completed by a
   zero-contribution union (materialized once).

All arithmetic is INTEGER (ranks in 1e-12 units, ``contrib = rank * w //
ow``, ``rank' = 15%*SCALE + 85%*Σcontrib // 100``) so results are
bit-identical regardless of partitioning, block order or cluster size —
and exactly replayable in SQL (the driver oracle unrolls the same integer
recurrence).  Dangling-node mass is dropped (the standard simplification;
deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .joins import derive_n_parts, part_array

SCALE = 10**12
_RANK_SCHEMA = pa.schema([("node", pa.string()), ("rank", pa.int64())])
_CONTRIB_SCHEMA = pa.schema([("node", pa.string()), ("contrib", pa.int64())])


def _collapsed_edges(adjacency: ray.data.Dataset, n_parts: int) -> ray.data.Dataset:
    """(u, v, w) with predicates collapsed, partitioned by hash(u), with
    the local out-weight ``ow`` attached per edge; sorted by u within
    each partition (the probe side of the iteration join)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            pa.table(
                {
                    "u": batch.column("src_id"),
                    "v": batch.column("dst_id"),
                    "w": batch.column("weight").cast(pa.int64()),
                }
            )
            .group_by(["u", "v"])
            .aggregate([("w", "sum")])
            .rename_columns(["u", "v", "w"])
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def prep_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.schema(
                [("u", pa.string()), ("v", pa.string()), ("w", pa.int64()),
                 ("ow", pa.int64()), ("part", pa.int32())]
            ).empty_table()
        # collapse duplicate (u,v) across input batches, then local ow(u)
        t = (
            part.group_by(["u", "v"])
            .aggregate([("w", "sum")])
            .rename_columns(["u", "v", "w"])
            .sort_by([("u", "ascending"), ("v", "ascending")])
        )
        u = t.column("u").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(new_u)
        seg_sums = np.add.reduceat(w, starts)
        ow = np.repeat(seg_sums, np.diff(np.concatenate([starts, [len(u)]])))
        pid = part.column("part")[0].as_py()
        return pa.table(
            {
                "u": t.column("u"),
                "v": t.column("v"),
                "w": t.column("w"),
                "ow": pa.array(ow, pa.int64()),
                "part": pa.array(np.full(len(u), pid, np.int32)),
            }
        )

    return (
        adjacency.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(prep_part, batch_format="pyarrow")
        .materialize()
    )


#: Pin edge partitions in the object store (one ``ray.put`` each, fetched
#: zero-copy per worker) when the collapsed edge table is below this —
#: the static side then never re-enters the per-iteration exchange
#: (shuffled rows/iteration drop from edges+ranks to ranks only; at the
#: 10⁶-edge probe wall-clock is within noise of the union path because
#: the contribution groupby dominates there, but the exchange-volume
#: reduction is what matters on a real network).  Above the bound,
#: iterations fall back to re-unioning the edge dataset (correct at any
#: size; bit-equality tested against the pinned path).
PIN_EDGES_BYTES_BOUND = 2 << 30

#: Below this collapsed-edge byte size the iterative operators run their
#: integer recurrences LOCALLY in one numpy pass (gathered once, no
#: per-iteration exchange) — bit-identical by exact-integer construction
#: and asserted against the distributed rounds in tests.  ~64 MB ≈ 1.3M
#: collapsed edges: every ray.data all-to-all costs seconds of fixed
#: scheduling latency, which dominated small-graph queries (5-iteration
#: PageRank on a 625-edge KG: 50 s distributed, <1 s local).  The
#: distributed path stays the only path above the bound.
LOCAL_GRAPH_BYTES_BOUND = 64 << 20


def _probe_contribs(
    rk_nodes: np.ndarray,
    rk_vals: np.ndarray,
    eu: np.ndarray,
    w: np.ndarray,
    ow: np.ndarray,
    v_col: pa.Array,
) -> pa.Table:
    """Vectorized rank→edge probe: sorted-rank searchsorted, integer
    contribution per edge."""
    order = np.argsort(rk_nodes, kind="mergesort")
    rk_nodes, rk_vals = rk_nodes[order], rk_vals[order]
    pos = np.searchsorted(rk_nodes, eu)
    # every edge source is a node with a rank row in this partition
    contrib = rk_vals[pos] * w // ow
    # local combine before the node exchange: shuffled rows per partition
    # drop from out-edges to distinct destinations (int sum, exact)
    return (
        pa.table({"node": v_col, "contrib": pa.array(contrib, pa.int64())})
        .group_by(["node"])
        .aggregate([("contrib", "sum")])
        .rename_columns(["node", "contrib"])
    )


def pagerank(
    adjacency: ray.data.Dataset,
    iters: int = 5,
    damping_pct: int = 85,
    pin_bytes_bound: int = PIN_EDGES_BYTES_BOUND,
    seed_pct: int | None = None,
) -> ray.data.Dataset:
    """Integer PageRank over the adjacency table: returns (node, rank)
    with rank in 1e-12 units, sorted by (rank desc, node asc).
    ``pin_bytes_bound=0`` forces the re-union fallback (tested
    bit-identical to the pinned path).

    ``seed_pct`` switches to PERSONALIZED PageRank: the teleport
    distribution concentrates on the md5-bucket landmark set
    (:func:`bfs_seed_mask`) instead of all nodes — initial rank and the
    per-iteration restart mass are non-zero only at seeds, so the
    stationary rank measures proximity to the seed entities (the
    query-anchored entity-importance feature of KG QA / recommendation).
    Same integer recurrence, same exchanges, bit-exact SQL unroll."""
    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)
    edges = _collapsed_edges(adjacency, n_parts)

    # Small-graph planner (round 5): below LOCAL_GRAPH_BYTES_BOUND the
    # whole collapsed edge table is gathered once and the integer
    # iterations run in numpy with NO per-iteration exchange — the rank
    # recurrence is exact integer arithmetic, so this is bit-identical
    # to the distributed rounds (asserted in tests), and each ray.data
    # all-to-all costs ~2-4 s of fixed scheduling latency that dominated
    # small-KG queries (5-iteration PageRank on a 625-edge KG measured
    # 50 s distributed vs <1 s local).  Above the bound the keyed
    # exchanges below are unchanged.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        et = pa.concat_tables(
            [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        ) if n_edges else None
        if et is None:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.int64())})
            )
        eu = et.column("u").to_numpy(zero_copy_only=False)
        ev = et.column("v").to_numpy(zero_copy_only=False)
        w = et.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        ow = et.column("ow").to_numpy(zero_copy_only=False).astype(np.int64)
        node_arr = np.unique(np.concatenate([eu, ev]))
        ui = np.searchsorted(node_arr, eu)
        vi = np.searchsorted(node_arr, ev)
        base = (100 - damping_pct) * SCALE // 100
        if seed_pct is None:
            rank = np.full(len(node_arr), SCALE, np.int64)
            base_vec = np.full(len(node_arr), base, np.int64)
        else:
            seed = bfs_seed_mask(pa.array(node_arr), seed_pct).to_numpy(
                zero_copy_only=False
            )
            rank = np.where(seed, SCALE, 0).astype(np.int64)
            base_vec = np.where(seed, base, 0).astype(np.int64)
        for _ in range(iters):
            contrib = rank[ui] * w // ow
            s = np.zeros(len(node_arr), np.int64)
            np.add.at(s, vi, contrib)
            rank = base_vec + damping_pct * s // 100
        out = pa.table(
            {"node": pa.array(node_arr), "rank": pa.array(rank, pa.int64())}
        )
        return ray.data.from_arrow(out).sort(["rank", "node"], descending=[True, False])

    # Pin the static side: below the byte bound, collect each edge
    # partition ONCE (sorted by u for the probe) into the object store —
    # per-iteration exchanges then carry only the rank rows.  The graph
    # is static across iterations; re-shuffling it every round was
    # measured as ~70 % of iteration wall at 10⁶ edges.
    edge_refs: dict[int, "ray.ObjectRef"] | None = None
    if edges.size_bytes() <= pin_bytes_bound:
        bufs: dict[int, list[pa.Table]] = {}
        for b in edges.iter_batches(batch_format="pyarrow"):
            for pid in pc.unique(b.column("part")).to_pylist():
                bufs.setdefault(pid, []).append(
                    b.filter(pc.equal(b.column("part"), pid))
                )
        edge_refs = {}
        for pid, tabs in bufs.items():
            t = pa.concat_tables(tabs).sort_by([("u", "ascending"), ("v", "ascending")])
            edge_refs[pid] = ray.put(t.select(["u", "v", "w", "ow"]))
        del bufs

    def node_partial(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [batch.column("u").combine_chunks(), batch.column("v").combine_chunks()]
        )
        return pa.table({"node": pc.unique(both)})

    nodes = (
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node")
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "contrib": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )

    zeros = nodes.map_batches(zero_rows, batch_format="pyarrow").materialize()
    base = (100 - damping_pct) * SCALE // 100

    def init_ranks(batch: pa.Table) -> pa.Table:
        if seed_pct is None:
            r = np.full(batch.num_rows, SCALE, np.int64)
        else:
            seed = bfs_seed_mask(batch.column("node"), seed_pct).to_numpy(
                zero_copy_only=False
            )
            r = np.where(seed, SCALE, 0).astype(np.int64)
        return pa.table({"node": batch.column("node"), "rank": pa.array(r)})

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow")

    def tag_ranks(batch: pa.Table) -> pa.Table:
        t = pa.table({"u": batch.column("node"), "rank": batch.column("rank")})
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def probe_pinned(part: pa.Table) -> pa.Table:
        """Ranks-only partition; this partition's (sorted) edges fetched
        zero-copy from the object store."""
        if part.num_rows == 0:
            return _CONTRIB_SCHEMA.empty_table()
        ref = edge_refs.get(part.column("part")[0].as_py())
        if ref is None:
            return _CONTRIB_SCHEMA.empty_table()
        et = ray.get(ref)
        return _probe_contribs(
            part.column("u").to_numpy(zero_copy_only=False),
            part.column("rank").to_numpy(zero_copy_only=False),
            et.column("u").to_numpy(zero_copy_only=False),
            et.column("w").to_numpy(zero_copy_only=False),
            et.column("ow").to_numpy(zero_copy_only=False),
            et.column("v").combine_chunks(),
        )

    for _ in range(iters):
        tagged = ranks.map_batches(tag_ranks, batch_format="pyarrow")

        # Per-partition probe: a map_groups over the UNION of rank rows
        # and edge rows (side-tagged), so both arrive in one exchange
        # keyed by the SAME partition id (edges carry theirs from prep).
        def rank_side(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "u": batch.column("u"),
                    "v": pa.array([None] * batch.num_rows, pa.string()),
                    "w": pa.array(np.zeros(batch.num_rows, np.int64)),
                    "ow": pa.array(np.zeros(batch.num_rows, np.int64)),
                    "rank": batch.column("rank"),
                    "is_edge": pa.array(np.zeros(batch.num_rows, np.int8)),
                    "part": batch.column("part"),
                }
            )
            return t

        def edge_side(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "u": batch.column("u"),
                    "v": batch.column("v"),
                    "w": batch.column("w"),
                    "ow": batch.column("ow"),
                    "rank": pa.array(np.zeros(batch.num_rows, np.int64)),
                    "is_edge": pa.array(np.ones(batch.num_rows, np.int8)),
                    "part": batch.column("part"),
                }
            )

        def probe(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return _CONTRIB_SCHEMA.empty_table()
            is_edge = part.column("is_edge").to_numpy(zero_copy_only=False) == 1
            if not is_edge.any():
                return _CONTRIB_SCHEMA.empty_table()
            u = part.column("u").to_numpy(zero_copy_only=False)
            em = pa.array(is_edge)
            return _probe_contribs(
                u[~is_edge],
                part.column("rank").to_numpy(zero_copy_only=False)[~is_edge],
                u[is_edge],
                part.column("w").to_numpy(zero_copy_only=False)[is_edge],
                part.column("ow").to_numpy(zero_copy_only=False)[is_edge],
                part.column("v").filter(em).combine_chunks(),
            )

        if edge_refs is not None:
            # pinned path: only rank rows cross the exchange
            contribs = tagged.groupby("part").map_groups(
                probe_pinned, batch_format="pyarrow"
            )
        else:
            unioned = tagged.map_batches(rank_side, batch_format="pyarrow").union(
                edges.map_batches(edge_side, batch_format="pyarrow")
            )
            contribs = unioned.groupby("part").map_groups(probe, batch_format="pyarrow")

        summed = (
            contribs.union(zeros)
            .groupby("node")
            .sum("contrib")
            .map_batches(lambda t: t.rename_columns(["node", "contrib"]), batch_format="pyarrow")
        )

        def new_rank(batch: pa.Table) -> pa.Table:
            s = batch.column("contrib").to_numpy(zero_copy_only=False)
            if seed_pct is None:
                b = base
            else:
                seed = bfs_seed_mask(batch.column("node"), seed_pct).to_numpy(
                    zero_copy_only=False
                )
                b = np.where(seed, base, 0).astype(np.int64)
            return pa.table(
                {
                    "node": batch.column("node"),
                    "rank": pa.array(b + damping_pct * s // 100, pa.int64()),
                }
            )

        ranks = summed.map_batches(new_rank, batch_format="pyarrow")

    return ranks.sort(["rank", "node"], descending=[True, False])


def triangle_count(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Exact triangle count of the UNDIRECTED simple graph underlying the
    adjacency table (predicates collapsed, self-loops dropped, direction
    ignored) — one row ``{n_triangles}``.

    The scale shape is degree-ordered wedge enumeration (the MapReduce
    triangle algorithm of Suri & Vassilvitskii, WWW'11): every edge is
    oriented from the endpoint that is SMALLER in the total order
    ``(degree, node)`` to the larger, which bounds every out-degree at
    O(sqrt(m)) and hence the wedge set at O(m^1.5) regardless of skew —
    a star graph generates zero wedges at its hub.  Stages, all keyed
    exchanges (no broadcast of anything graph-sized):

    1. dedup to canonical undirected edges (groupby on the edge key);
    2. degree per node (flat-map endpoints → groupby count);
    3. attach each endpoint's degree with two co-partitioned side-tagged
       unions (the same vectorized searchsorted probe PageRank uses);
    4. orient; group oriented edges by source; emit all out-neighbor
       pairs per source, vectorized (repeat/concat index arithmetic);
    5. co-partition wedges with oriented edges on the (lo, hi) pair key
       and count matches per partition; tiny final sum.
    """
    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)

    def undirected(batch: pa.Table) -> pa.Table:
        u = batch.column("src_id")
        v = batch.column("dst_id")
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"a": lo, "b": hi})
        t = t.group_by(["a", "b"]).aggregate([]).sort_by([("a", "ascending"), ("b", "ascending")])
        return t.append_column("part", part_array(t, ["a", "b"], n_parts))

    def dedup_part(part: pa.Table) -> pa.Table:
        return part.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    edges = (
        adjacency.map_batches(undirected, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
        .materialize()
    )

    # Small-graph planner (round 5): below LOCAL_GRAPH_BYTES_BOUND count
    # triangles locally over the gathered deduped edge set (Σ common
    # neighbors over edges = 3·triangles; exact integers, bit-equal to
    # the wedge exchanges — asserted in tests).
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        n_tri = 0
        if tabs:
            et = pa.concat_tables(tabs)
            a = et.column("a").to_pylist()
            b = et.column("b").to_pylist()
            nbrs: dict[str, set] = {}
            for x, y in zip(a, b):
                nbrs.setdefault(x, set()).add(y)
                nbrs.setdefault(y, set()).add(x)
            tot = 0
            for x, y in zip(a, b):
                s1, s2 = nbrs[x], nbrs[y]
                tot += len(s1 & s2) if len(s1) <= len(s2) else len(s2 & s1)
            n_tri = tot // 3
        return ray.data.from_arrow(
            pa.table({"n_triangles": pa.array([n_tri], pa.int64())})
        )

    def endpoints(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
        )
        vc = pc.value_counts(both)
        return pa.table(
            {"node": vc.field("values"), "deg": vc.field("counts").cast(pa.int64())}
        )

    degrees = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .sum("deg")
        .map_batches(lambda t: t.rename_columns(["node", "deg"]), batch_format="pyarrow")
        .materialize()
    )

    def _attach(
        edge_ds: ray.data.Dataset,
        key: str,
        out_col: str,
        edge_schema: pa.Schema,
    ) -> ray.data.Dataset:
        """Co-partition edges (keyed by ``key``) with degrees; append
        ``out_col`` = deg(key) via a per-partition searchsorted probe."""

        def edge_tag(batch: pa.Table) -> pa.Table:
            t = batch.append_column(
                "node", batch.column(key)
            ).append_column("deg", pa.array(np.zeros(batch.num_rows, np.int64)))
            t = t.append_column("is_edge", pa.array(np.ones(batch.num_rows, np.int8)))
            return t.append_column("part", part_array(batch, [key], n_parts))

        def deg_tag(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in zip(edge_cols, edge_types):
                cols[name] = pa.nulls(n, typ)
            cols["node"] = batch.column("node")
            cols["deg"] = batch.column("deg")
            cols["is_edge"] = pa.array(np.zeros(n, np.int8))
            t = pa.table(cols)
            return t.append_column(
                "part", part_array(pa.table({"k": batch.column("node")}), ["k"], n_parts)
            )

        edge_cols = list(edge_schema.names)
        edge_types = [edge_schema.field(c).type for c in edge_cols]

        def probe(part: pa.Table) -> pa.Table:
            is_e = part.column("is_edge").to_numpy(zero_copy_only=False) == 1
            if not is_e.any():
                sch = pa.schema(
                    [(c, pa.string()) for c in edge_cols] + [(out_col, pa.int64())]
                )
                return sch.empty_table()
            nodes_ = part.column("node").to_numpy(zero_copy_only=False)
            dn = nodes_[~is_e]
            dv = part.column("deg").to_numpy(zero_copy_only=False)[~is_e]
            order = np.argsort(dn, kind="mergesort")
            dn, dv = dn[order], dv[order]
            pos = np.searchsorted(dn, nodes_[is_e])
            out = {c: part.column(c).filter(pa.array(is_e)) for c in edge_cols}
            out[out_col] = pa.array(dv[pos], pa.int64())
            return pa.table(out)

        unioned = edge_ds.map_batches(edge_tag, batch_format="pyarrow").union(
            degrees.map_batches(deg_tag, batch_format="pyarrow")
        )
        return unioned.groupby("part").map_groups(probe, batch_format="pyarrow")

    ab_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    with_da = _attach(edges, "a", "deg_a", ab_schema)
    with_db = _attach(
        with_da, "b", "deg_b", ab_schema.append(pa.field("deg_a", pa.int64()))
    )

    def orient(batch: pa.Table) -> pa.Table:
        """src = endpoint smaller in the (deg, node) total order."""
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        da = batch.column("deg_a").to_numpy(zero_copy_only=False)
        db = batch.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ds_ = np.where(a_first, da, db)
        dd = np.where(a_first, db, da)
        t = pa.table(
            {
                "src": pa.array(src, pa.string()),
                "dst": pa.array(dst, pa.string()),
                "dsrc": pa.array(ds_.astype(np.int64)),
                "ddst": pa.array(dd.astype(np.int64)),
            }
        )
        return t.append_column("part", part_array(t, ["src"], n_parts))

    oriented = with_db.map_batches(orient, batch_format="pyarrow").materialize()

    wedge_schema = pa.schema([("lo", pa.string()), ("hi", pa.string())])

    def wedges(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return wedge_schema.empty_table()
        t = part.sort_by(
            [("src", "ascending"), ("ddst", "ascending"), ("dst", "ascending")]
        )
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], src[1:] != src[:-1]])
        starts = np.flatnonzero(new)
        lens = np.diff(np.concatenate([starts, [len(src)]]))
        # all ordered pairs (i < j) within each group, vectorized:
        # for a group of length L there are L*(L-1)/2 pairs
        n_pairs = lens * (lens - 1) // 2
        if int(n_pairs.sum()) == 0:
            return wedge_schema.empty_table()
        lo_idx, hi_idx = [], []
        for s, l in zip(starts.tolist(), lens.tolist()):
            if l < 2:
                continue
            iu = np.triu_indices(l, k=1)
            lo_idx.append(iu[0] + s)
            hi_idx.append(iu[1] + s)
        lo_i = np.concatenate(lo_idx)
        hi_i = np.concatenate(hi_idx)
        # rows are sorted by (ddst, dst) within the group, i.e. by the
        # (deg, node) total order — so (lo, hi) matches the orientation
        return pa.table({"lo": pa.array(dst[lo_i], pa.string()), "hi": pa.array(dst[hi_i], pa.string())})

    def wedge_part(batch: pa.Table) -> pa.Table:
        return batch.append_column("part", part_array(batch, ["lo", "hi"], n_parts))

    wedge_ds = (
        oriented.groupby("part")
        .map_groups(wedges, batch_format="pyarrow")
        .map_batches(wedge_part, batch_format="pyarrow")
    )

    def edge_key_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lo": batch.column("src"),
                "hi": batch.column("dst"),
                "is_edge": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )
        return t.append_column("part", part_array(t, ["lo", "hi"], n_parts))

    def wedge_tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lo": batch.column("lo"),
                "hi": batch.column("hi"),
                "is_edge": pa.array(np.zeros(batch.num_rows, np.int8)),
                "part": batch.column("part"),
            }
        )

    joined = wedge_ds.map_batches(wedge_tag, batch_format="pyarrow").union(
        oriented.map_batches(edge_key_tag, batch_format="pyarrow")
    )

    def count_part(part: pa.Table) -> pa.Table:
        is_e = part.column("is_edge").to_numpy(zero_copy_only=False) == 1
        if not is_e.any() or is_e.all():
            return pa.table({"n": pa.array([0], pa.int64())})
        lo = part.column("lo").to_numpy(zero_copy_only=False)
        hi = part.column("hi").to_numpy(zero_copy_only=False)
        ek = np.char.add(np.char.add(lo[is_e].astype(str), "\x00"), hi[is_e].astype(str))
        wk = np.char.add(np.char.add(lo[~is_e].astype(str), "\x00"), hi[~is_e].astype(str))
        ek.sort()
        pos = np.searchsorted(ek, wk)
        pos_c = np.minimum(pos, len(ek) - 1)
        n = int((ek[pos_c] == wk).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    per_part = joined.groupby("part").map_groups(count_part, batch_format="pyarrow")

    # the per-partition counts are one int each: tiny final driver fold
    s = int(per_part.to_pandas()["n"].sum())
    return ray.data.from_arrow(pa.table({"n_triangles": pa.array([s], pa.int64())}))


def edge_jaccard(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Per-edge neighborhood similarity of the undirected simple graph
    underlying the adjacency table: for every canonical edge (a < b by
    node name) the common-neighbor count ``|N(a) ∩ N(b)|`` (= triangles
    through the edge) and the Jaccard link score ``cn / (deg_a + deg_b −
    cn)`` in integer micro-units — the classic link-prediction /
    entity-resolution feature over a constructed KG.

    Scale shape: the same degree-ordered wedge machinery as
    :func:`triangle_count` (out-degree bounded O(√m), all keyed
    exchanges, nothing graph-sized broadcast), except matched wedges emit
    THREE per-edge credit rows (each triangle touches 3 edges), which are
    pre-combined per partition before one edge-keyed groupby; the final
    attach joins credits + endpoint degrees back onto the full edge set
    co-partitioned on the edge key (LEFT semantics — triangle-free edges
    report cn = 0)."""
    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)

    def undirected(batch: pa.Table) -> pa.Table:
        u = batch.column("src_id")
        v = batch.column("dst_id")
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"a": lo, "b": hi})
        t = t.group_by(["a", "b"]).aggregate([])
        return t.append_column("part", part_array(t, ["a", "b"], n_parts))

    def dedup_part(part: pa.Table) -> pa.Table:
        return part.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    edges = (
        adjacency.map_batches(undirected, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
        .materialize()
    )

    # Small-graph planner (round 5, the pagerank/hits convention): below
    # LOCAL_GRAPH_BYTES_BOUND the deduped edge set is gathered once and
    # degrees / common-neighbor counts / the micro-Jaccard are computed
    # locally — identical integers and the identical float64 rounding
    # expression, so bit-equal to the wedge-exchange path (asserted in
    # tests).  This also collapses ktruss and clustering_coefficient,
    # which compose this operator (5-round ktruss on the 625-edge KG
    # measured 43 s distributed).  Above the bound: unchanged exchanges.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        out_schema = pa.schema(
            [
                ("node_a", pa.string()),
                ("node_b", pa.string()),
                ("deg_a", pa.int64()),
                ("deg_b", pa.int64()),
                ("n_common", pa.int64()),
                ("jacc_micro", pa.int64()),
            ]
        )
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(out_schema.empty_table())
        et = pa.concat_tables(tabs)
        a = et.column("a").to_pylist()
        b = et.column("b").to_pylist()
        nbrs: dict[str, set] = {}
        for x, y in zip(a, b):
            nbrs.setdefault(x, set()).add(y)
            nbrs.setdefault(y, set()).add(x)
        da = np.array([len(nbrs[x]) for x in a], np.int64)
        db = np.array([len(nbrs[y]) for y in b], np.int64)
        cn = np.array(
            [
                len(nbrs[x] & nbrs[y]) if len(nbrs[x]) <= len(nbrs[y]) else len(nbrs[y] & nbrs[x])
                for x, y in zip(a, b)
            ],
            np.int64,
        )
        denom = (da + db - cn).astype(np.float64)
        jacc = np.floor(cn.astype(np.float64) * 1000000.0 / denom + 0.5).astype(np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node_a": pa.array(a, pa.string()),
                    "node_b": pa.array(b, pa.string()),
                    "deg_a": pa.array(da, pa.int64()),
                    "deg_b": pa.array(db, pa.int64()),
                    "n_common": pa.array(cn, pa.int64()),
                    "jacc_micro": pa.array(jacc, pa.int64()),
                }
            )
        )

    def endpoints(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
        )
        vc = pc.value_counts(both)
        return pa.table(
            {"node": vc.field("values"), "deg": vc.field("counts").cast(pa.int64())}
        )

    degrees = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .sum("deg")
        .map_batches(lambda t: t.rename_columns(["node", "deg"]), batch_format="pyarrow")
        .materialize()
    )

    def _attach(
        edge_ds: ray.data.Dataset,
        lookup: ray.data.Dataset,
        key: str,
        out_col: str,
        edge_schema: pa.Schema,
        default: int | None = None,
        lookup_keys: list[str] | None = None,
    ) -> ray.data.Dataset:
        """Co-partition ``edge_ds`` (on ``key`` — one column, or the
        composite (a, b) pair when ``lookup_keys`` is set) with ``lookup``
        rows (node/deg or a/b/val); append ``out_col`` via a sorted
        searchsorted probe.  ``default`` None = every key must hit (degree
        attach); an int = LEFT semantics (credit attach)."""
        lk = lookup_keys or ["node"]
        edge_cols = list(edge_schema.names)
        edge_types = [edge_schema.field(c).type for c in edge_cols]

        def _ck(tab: pa.Table, cols: list[str]) -> np.ndarray:
            parts_ = [tab.column(c).to_numpy(zero_copy_only=False).astype(str) for c in cols]
            out = parts_[0]
            for nxt in parts_[1:]:
                out = np.char.add(np.char.add(out, "\x00"), nxt)
            return out

        part_cols = [key] if lookup_keys is None else ["a", "b"]

        def edge_tag(batch: pa.Table) -> pa.Table:
            t = batch
            for c in lk:
                if c not in t.schema.names:
                    t = t.append_column(c, pa.nulls(batch.num_rows, pa.string()))
            t = t.append_column("val", pa.array(np.zeros(batch.num_rows, np.int64)))
            t = t.append_column("is_edge", pa.array(np.ones(batch.num_rows, np.int8)))
            return t.append_column("part", part_array(batch, part_cols, n_parts))

        def lk_tag(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {c: pa.nulls(n, typ) for c, typ in zip(edge_cols, edge_types)}
            for c in lk:
                cols[c] = batch.column(c)
            val_col = [c for c in batch.schema.names if c not in lk][0]
            cols["val"] = batch.column(val_col).cast(pa.int64())
            cols["is_edge"] = pa.array(np.zeros(n, np.int8))
            t = pa.table(cols)
            return t.append_column(
                "part", part_array(batch.select(lk), lk, n_parts)
            )

        def probe(part: pa.Table) -> pa.Table:
            is_e = part.column("is_edge").to_numpy(zero_copy_only=False) == 1
            if not is_e.any():
                sch = pa.schema(
                    list(zip(edge_cols, edge_types)) + [(out_col, pa.int64())]
                )
                return sch.empty_table()
            if lookup_keys is None:
                probe_k = part.column(key).to_numpy(zero_copy_only=False).astype(str)[is_e]
                lk_k = _ck(part.filter(pa.array(~is_e)), lk)
            else:
                probe_k = _ck(part.filter(pa.array(is_e)), ["a", "b"])
                lk_k = _ck(part.filter(pa.array(~is_e)), lk)
            lv = part.column("val").to_numpy(zero_copy_only=False)[~is_e]
            order = np.argsort(lk_k, kind="mergesort")
            lk_k, lv = lk_k[order], lv[order]
            pos = np.searchsorted(lk_k, probe_k)
            out = {c: part.column(c).filter(pa.array(is_e)) for c in edge_cols}
            if default is None:
                out[out_col] = pa.array(lv[pos], pa.int64())
            else:
                pos_c = np.minimum(pos, max(len(lk_k) - 1, 0))
                hit = (len(lk_k) > 0) & (lk_k[pos_c] == probe_k) if len(lk_k) else np.zeros(len(probe_k), bool)
                vals = np.where(hit, lv[pos_c] if len(lk_k) else 0, default)
                out[out_col] = pa.array(vals.astype(np.int64), pa.int64())
            return pa.table(out)

        unioned = edge_ds.map_batches(edge_tag, batch_format="pyarrow").union(
            lookup.map_batches(lk_tag, batch_format="pyarrow")
        )
        return unioned.groupby("part").map_groups(probe, batch_format="pyarrow")

    ab = pa.schema([("a", pa.string()), ("b", pa.string())])
    with_da = _attach(edges, degrees, "a", "deg_a", ab)
    with_db = _attach(
        with_da, degrees, "b", "deg_b", ab.append(pa.field("deg_a", pa.int64()))
    ).materialize()

    def orient(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        da = batch.column("deg_a").to_numpy(zero_copy_only=False)
        db = batch.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        t = pa.table(
            {
                "src": pa.array(np.where(a_first, a, b), pa.string()),
                "dst": pa.array(np.where(a_first, b, a), pa.string()),
                "ddst": pa.array(np.where(a_first, db, da).astype(np.int64)),
            }
        )
        return t.append_column("part", part_array(t, ["src"], n_parts))

    oriented = with_db.map_batches(orient, batch_format="pyarrow").materialize()

    wedge_schema = pa.schema(
        [("lo", pa.string()), ("hi", pa.string()), ("apex", pa.string())]
    )

    def wedges(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return wedge_schema.empty_table()
        t = part.sort_by(
            [("src", "ascending"), ("ddst", "ascending"), ("dst", "ascending")]
        )
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], src[1:] != src[:-1]])
        starts = np.flatnonzero(new)
        lens = np.diff(np.concatenate([starts, [len(src)]]))
        if int((lens * (lens - 1) // 2).sum()) == 0:
            return wedge_schema.empty_table()
        lo_idx, hi_idx = [], []
        for s, l in zip(starts.tolist(), lens.tolist()):
            if l < 2:
                continue
            iu = np.triu_indices(l, k=1)
            lo_idx.append(iu[0] + s)
            hi_idx.append(iu[1] + s)
        lo_i = np.concatenate(lo_idx)
        hi_i = np.concatenate(hi_idx)
        return pa.table(
            {
                "lo": pa.array(dst[lo_i], pa.string()),
                "hi": pa.array(dst[hi_i], pa.string()),
                "apex": pa.array(src[lo_i], pa.string()),
            }
        )

    wedge_ds = (
        oriented.groupby("part")
        .map_groups(wedges, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("part", part_array(t, ["lo", "hi"], n_parts)),
            batch_format="pyarrow",
        )
    )

    def edge_key_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lo": batch.column("src"),
                "hi": batch.column("dst"),
                "apex": pa.nulls(batch.num_rows, pa.string()),
                "is_edge": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )
        return t.append_column("part", part_array(t, ["lo", "hi"], n_parts))

    def wedge_tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lo": batch.column("lo"),
                "hi": batch.column("hi"),
                "apex": batch.column("apex"),
                "is_edge": pa.array(np.zeros(batch.num_rows, np.int8)),
                "part": batch.column("part"),
            }
        )

    joined = wedge_ds.map_batches(wedge_tag, batch_format="pyarrow").union(
        oriented.map_batches(edge_key_tag, batch_format="pyarrow")
    )

    credit_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("cn", pa.int64())]
    )

    def credit_part(part: pa.Table) -> pa.Table:
        is_e = part.column("is_edge").to_numpy(zero_copy_only=False) == 1
        if not is_e.any() or is_e.all():
            return credit_schema.empty_table()
        lo = part.column("lo").to_numpy(zero_copy_only=False).astype(str)
        hi = part.column("hi").to_numpy(zero_copy_only=False).astype(str)
        ek = np.char.add(np.char.add(lo[is_e], "\x00"), hi[is_e])
        ek.sort()
        wl, wh = lo[~is_e], hi[~is_e]
        wk = np.char.add(np.char.add(wl, "\x00"), wh)
        pos = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
        hit = ek[pos] == wk
        if not hit.any():
            return credit_schema.empty_table()
        ap = part.column("apex").to_numpy(zero_copy_only=False).astype(str)[~is_e][hit]
        wl, wh = wl[hit], wh[hit]
        # each closed triangle {apex, lo, hi} credits its 3 edges, each
        # keyed canonical (name-min, name-max)
        # wedge lo/hi are DEGREE-ordered; credit keys must be NAME-canonical
        # (numpy string minimum/maximum reject mixed itemsizes, use where)
        al, ah, lh = ap < wl, ap < wh, wl < wh
        ca = np.concatenate([np.where(lh, wl, wh), np.where(al, ap, wl), np.where(ah, ap, wh)])
        cb = np.concatenate([np.where(lh, wh, wl), np.where(al, wl, ap), np.where(ah, wh, ap)])
        t = pa.table({"a": pa.array(ca, pa.string()), "b": pa.array(cb, pa.string())})
        g = t.group_by(["a", "b"]).aggregate([("a", "count")])
        return pa.table(
            {
                "a": g.column("a"),
                "b": g.column("b"),
                "cn": g.column("a_count").cast(pa.int64()),
            }
        )

    credits = (
        joined.groupby("part")
        .map_groups(credit_part, batch_format="pyarrow")
        .groupby(["a", "b"])
        .sum("cn")
        .map_batches(lambda t: t.rename_columns(["a", "b", "cn"]), batch_format="pyarrow")
    )

    abdd = pa.schema(
        [
            ("a", pa.string()),
            ("b", pa.string()),
            ("deg_a", pa.int64()),
            ("deg_b", pa.int64()),
        ]
    )
    with_cn = _attach(
        with_db, credits, "a", "n_common", abdd, default=0, lookup_keys=["a", "b"]
    )

    def finish(batch: pa.Table) -> pa.Table:
        cn = batch.column("n_common").to_numpy(zero_copy_only=False).astype(np.float64)
        da = batch.column("deg_a").to_numpy(zero_copy_only=False)
        db = batch.column("deg_b").to_numpy(zero_copy_only=False)
        denom = (da + db - cn.astype(np.int64)).astype(np.float64)
        jacc = np.floor(cn * 1000000.0 / denom + 0.5).astype(np.int64)
        return pa.table(
            {
                "node_a": batch.column("a"),
                "node_b": batch.column("b"),
                "deg_a": batch.column("deg_a"),
                "deg_b": batch.column("deg_b"),
                "n_common": batch.column("n_common"),
                "jacc_micro": pa.array(jacc, pa.int64()),
            }
        )

    return with_cn.map_batches(finish, batch_format="pyarrow")


# --- k-core: synchronized peeling to fixpoint --------------------------------

def kcore(adjacency: ray.data.Dataset, k: int = 2, max_rounds: int = 8) -> ray.data.Dataset:
    """Nodes of the ``k``-core of the undirected simple graph underlying
    the adjacency table (self-loops dropped, direction/predicates
    ignored), with each survivor's within-core degree — synchronized
    peeling: every round recomputes degrees over the surviving edges and
    removes ALL nodes under ``k`` at once, which converges to the exact
    k-core (Matula & Beck's peel, batch-synchronous).

    Scale shape: per round, (1) one combine-fed endpoint exchange for
    degrees, (2) two side-tagged co-partitioned exchanges that keep only
    edges whose ``a`` / ``b`` endpoint is alive (vectorized ``is_in``
    probe per partition — the alive set is never broadcast, so a round
    that kills 90 % of a 10¹⁰-node graph ships labels only through the
    keyed exchange).  Rounds stop at the fixpoint (a round that kills
    nobody) or after ``max_rounds``; extra rounds past the fixpoint are
    no-ops, which is what lets the SQL oracle unroll a FIXED round count
    and still compare exactly.  Surviving edges re-materialize per round
    (the static-input analogue of PageRank's pinned edges)."""
    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)

    def undirected(batch: pa.Table) -> pa.Table:
        u, v = batch.column("src_id"), batch.column("dst_id")
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        t = pa.table({"a": pc.min_element_wise(u, v), "b": pc.max_element_wise(u, v)})
        t = t.group_by(["a", "b"]).aggregate([])
        return t.append_column("part", part_array(t, ["a", "b"], n_parts))

    def dedup_part(part: pa.Table) -> pa.Table:
        return part.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    edges = (
        adjacency.map_batches(undirected, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
        .materialize()
    )

    # Small-graph planner (round 5): local synchronized peeling —
    # identical integer degrees and round semantics (tests).
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.string()), "deg": pa.array([], pa.int64())})
            )
        et = pa.concat_tables(tabs)
        a = et.column("a").to_numpy(zero_copy_only=False)
        b = et.column("b").to_numpy(zero_copy_only=False)
        node_arr = np.unique(np.concatenate([a, b]))
        ai = np.searchsorted(node_arr, a)
        bi = np.searchsorted(node_arr, b)
        alive_e = np.ones(len(ai), bool)
        deg = np.bincount(np.concatenate([ai, bi]), minlength=len(node_arr)).astype(np.int64)
        for _ in range(max_rounds):
            # the distributed check is over EXISTING degree rows — a node
            # with no surviving edge has no row, so deg==0 never counts
            if not ((deg > 0) & (deg < k)).any():
                break
            alive_n = deg >= k
            alive_e &= alive_n[ai] & alive_n[bi]
            deg = np.bincount(
                np.concatenate([ai[alive_e], bi[alive_e]]), minlength=len(node_arr)
            ).astype(np.int64)
        keep = (deg >= k) & (deg > 0)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_arr[keep]),
                    "deg": pa.array(deg[keep], pa.int64()),
                }
            )
        ).sort("node")

    def degree_partial(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
        )
        vc = pc.value_counts(both)
        return pa.table(
            {"node": vc.field("values"), "d": vc.field("counts").cast(pa.int64())}
        )

    def degrees(e: ray.data.Dataset) -> ray.data.Dataset:
        return (
            e.map_batches(degree_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(ray.data.aggregate.Sum("d", alias_name="deg"))
        )

    edge_keep_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

    def keep_alive(e: ray.data.Dataset, alive: ray.data.Dataset, key: str) -> ray.data.Dataset:
        def edge_tag(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "key": batch.column(key),
                    "a": batch.column("a"),
                    "b": batch.column("b"),
                    "side": pa.array(np.zeros(batch.num_rows, np.int8)),
                }
            )
            return t.append_column("part", part_array(t, ["key"], n_parts))

        def alive_tag(batch: pa.Table) -> pa.Table:
            nodes = batch.column("node")
            t = pa.table(
                {
                    "key": nodes,
                    "a": nodes,
                    "b": nodes,
                    "side": pa.array(np.ones(batch.num_rows, np.int8)),
                }
            )
            return t.append_column("part", part_array(t, ["key"], n_parts))

        def probe(part: pa.Table) -> pa.Table:
            side = part.column("side").to_numpy(zero_copy_only=False)
            is_e = side == 0
            if not is_e.any():
                return edge_keep_schema.empty_table()
            alive_keys = part.column("key").filter(pa.array(~is_e)).combine_chunks()
            epart = part.filter(pa.array(is_e))
            hit = pc.is_in(epart.column("key"), value_set=alive_keys)
            return epart.filter(hit).select(["a", "b"])

        tagged = e.map_batches(edge_tag, batch_format="pyarrow").union(
            alive.map_batches(alive_tag, batch_format="pyarrow")
        )
        return tagged.groupby("part").map_groups(probe, batch_format="pyarrow")

    deg = degrees(edges).materialize()
    for _ in range(max_rounds):
        if deg.filter(expr=f"deg < {k}").count() == 0:
            break
        alive = deg.filter(expr=f"deg >= {k}")
        edges = keep_alive(edges, alive, "a")
        edges = keep_alive(edges, alive, "b").materialize()
        deg = degrees(edges).materialize()

    return deg.filter(expr=f"deg >= {k}").sort("node")


def degree_histogram(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Degree distribution of the undirected simple KG entity graph
    (the power-law / hub-skew diagnostic that sizes every other graph
    operator's partitioning): for each degree value, how many nodes have
    it.  Two combine-fed exchanges — endpoint degree counts, then counts
    of counts — each bounded by distinct keys per batch; output is
    ≤ max-degree rows."""
    from ray.data.aggregate import Sum

    n_parts = derive_n_parts(adjacency.count(), rows_per_part=65536)

    def undirected(batch: pa.Table) -> pa.Table:
        u, v = batch.column("src_id"), batch.column("dst_id")
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        t = pa.table({"a": pc.min_element_wise(u, v), "b": pc.max_element_wise(u, v)})
        t = t.group_by(["a", "b"]).aggregate([])
        return t.append_column("part", part_array(t, ["a", "b"], n_parts))

    def dedup_part(part: pa.Table) -> pa.Table:
        return part.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    edges = (
        adjacency.map_batches(undirected, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
        )
        vc = pc.value_counts(both)
        return pa.table(
            {"node": vc.field("values"), "d": vc.field("counts").cast(pa.int64())}
        )

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("deg").combine_chunks())
        return pa.table(
            {
                "deg": vc.field("values").cast(pa.int64()),
                "n_nodes": vc.field("counts").cast(pa.int64()),
            }
        )

    return (
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("deg")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
        .sort("deg")
    )


def pred_bigrams(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Two-hop metapath counts over the directed KG: for every ordered
    predicate pair (p1, p2), how many paths a —p1→ b —p2→ c exist — the
    schema-induction / relation-composition statistic (which relations
    chain through shared entities).

    Scale shape: every adjacency row ships TWICE through one side-tagged
    hash exchange on its middle-node role (as an in-edge keyed by dst,
    as an out-edge keyed by src); within a partition the per-node
    (pred → count) tallies come from one Arrow hash-aggregate and the
    path counts are the per-node CROSS PRODUCT of in-pred × out-pred
    tallies, materialized with repeat/tile index arithmetic and
    pre-combined before the tiny final (p1, p2) groupby — no row-level
    join ever enumerates the paths themselves (a hub with 10⁶ in × 10⁶
    out edges contributes |preds|² rows, not 10¹²)."""
    from ray.data.aggregate import Sum

    from .joins import hash_partitioned_groups

    n_parts = derive_n_parts(adjacency.count(), rows_per_part=65536)

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("dst_id").combine_chunks(),  # in-edge at its head
                        batch.column("src_id").combine_chunks(),  # out-edge at its tail
                    ]
                ),
                "pred": pa.concat_arrays(
                    [batch.column("pred").combine_chunks()] * 2
                ),
                "side": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
                ),
            }
        )

    out_schema = pa.schema([("p1", pa.string()), ("p2", pa.string()), ("n_paths", pa.int64())])

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = (
            part.select(["node", "side", "pred"])
            .group_by(["node", "side", "pred"])
            .aggregate([([], "count_all")])
            .sort_by([("node", "ascending"), ("side", "ascending"), ("pred", "ascending")])
        )
        node = g.column("node").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        pred = g.column("pred").to_numpy(zero_copy_only=False)
        cnt = g.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
        first = np.concatenate([[True], node[1:] != node[:-1]])
        s0 = np.flatnonzero(first)
        s1 = np.concatenate([s0[1:], [len(node)]])
        p1_l, p2_l, n_l = [], [], []
        # loop over NODES within the partition run-wise, but the work per
        # node is |preds_in| × |preds_out| (bounded by the predicate
        # vocabulary, not the edge count)
        for a, b in zip(s0, s1):
            sides = side[a:b]
            in_m = sides == 0
            out_m = sides == 1
            if not in_m.any() or not out_m.any():
                continue
            pi, ci = pred[a:b][in_m], cnt[a:b][in_m]
            po, co = pred[a:b][out_m], cnt[a:b][out_m]
            p1_l.append(np.repeat(pi, len(po)))
            p2_l.append(np.tile(po, len(pi)))
            n_l.append((ci[:, None] * co[None, :]).reshape(-1))
        if not p1_l:
            return out_schema.empty_table()
        t = pa.table(
            {
                "p1": pa.array(np.concatenate(p1_l), pa.string()),
                "p2": pa.array(np.concatenate(p2_l), pa.string()),
                "n_paths": pa.array(np.concatenate(n_l), pa.int64()),
            }
        )
        return (
            t.group_by(["p1", "p2"]).aggregate([("n_paths", "sum")]).rename_columns(["p1", "p2", "n_paths"])
        )

    tagged = adjacency.map_batches(tag, batch_format="pyarrow")
    partials = hash_partitioned_groups(tagged, ["node"], per_part, n_parts)
    return (
        partials.groupby(["p1", "p2"])
        .aggregate(Sum("n_paths", alias_name="n_paths"))
        .sort(["p1", "p2"])
    )


# --- multi-source BFS: hop distance from hash-seeded landmarks ---------------

def _undirected_both_dirs(adjacency: ray.data.Dataset, n_parts: int) -> ray.data.Dataset:
    """Distinct undirected simple edges of the KG entity graph,
    materialized BOTH directions as (u, v) rows (self-loops dropped,
    predicates/weights ignored) and hash-partitioned by ``u`` — the
    static probe side shared by :func:`bfs_hops` and
    :func:`label_propagation`.  Dedup is exact: canonical (min, max)
    pairs flow through one keyed exchange before mirroring."""

    def canon(batch: pa.Table) -> pa.Table:
        u, v = batch.column("src_id"), batch.column("dst_id")
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        t = pa.table({"a": pc.min_element_wise(u, v), "b": pc.max_element_wise(u, v)})
        t = t.group_by(["a", "b"]).aggregate([])
        return t.append_column("part", part_array(t, ["a", "b"], n_parts))

    def mirror(part: pa.Table) -> pa.Table:
        d = part.select(["a", "b"]).group_by(["a", "b"]).aggregate([])
        a, b = d.column("a").combine_chunks(), d.column("b").combine_chunks()
        t = pa.table(
            {"u": pa.concat_arrays([a, b]), "v": pa.concat_arrays([b, a])}
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    return (
        adjacency.map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(mirror, batch_format="pyarrow")
        .materialize()
    )


def bfs_seed_mask(nodes: "pa.Array | pa.ChunkedArray", pct: int) -> pa.Array:
    """Deterministic landmark selection: node is a BFS source iff its
    md5('seed:'+node) bucket < ``pct`` of 100 — the same cross-engine
    md5-bucket rule every sampling oracle replays
    (``CAST(('0x'||substr(md5('seed:'||node),1,8)) AS UBIGINT) % 100``)."""
    import hashlib

    return pa.array(
        [
            int(hashlib.md5(("seed:" + s).encode()).hexdigest()[:8], 16) % 100 < pct
            for s in nodes.to_pylist()
        ],
        pa.bool_(),
    )


def bfs_hops(
    adjacency: ray.data.Dataset,
    seed_pct: int = 5,
    max_hops: int = 6,
    seeds: list[str] | None = None,
) -> ray.data.Dataset:
    """Multi-source BFS hop distance over the undirected KG entity graph
    (the landmark-distance feature of graph ML / KG QA: how many hops is
    each entity from the nearest seed): sources are the deterministic
    md5-bucket ``seed_pct``% of nodes; output is (node, dist) for every
    node REACHED within ``max_hops`` (unreached nodes carry no row —
    distance ∞ stays implicit, never materialized).

    Scale shape: the mirrored edge table partitions once and pins
    (static graph, iterating frontier, the PageRank discipline); each
    round the current distance table exchanges ONCE through the same
    hash as the edges, the per-partition probe is a vectorized
    sorted-array ``searchsorted`` join emitting (neighbor, dist+1)
    candidates pre-combined locally (min per neighbor), and one
    ``groupby(node).min`` folds candidates into the running distances.
    Distance relaxation is MONOTONE (min of ints), so running exactly
    ``max_hops`` rounds is deterministic at any partitioning and a
    fixed-depth SQL unroll compares exactly — rounds past convergence
    are no-ops.  Per-round exchange volume is O(frontier ∪ dists), never
    O(edges): the edge side is static."""
    from ray.data.aggregate import Min

    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)
    edges = _undirected_both_dirs(adjacency, n_parts)

    # Small-graph planner (round 5): below LOCAL_GRAPH_BYTES_BOUND run
    # the monotone integer relaxation locally over the gathered mirrored
    # edge table — exactly max_hops synchronous rounds, bit-equal to the
    # distributed exchanges (asserted in tests); unchanged above.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.string()), "dist": pa.array([], pa.int64())})
            )
        et = pa.concat_tables(tabs)
        u = et.column("u").to_numpy(zero_copy_only=False)
        v = et.column("v").to_numpy(zero_copy_only=False)
        node_arr = np.unique(u)  # mirrored: every endpoint appears as u
        ui = np.searchsorted(node_arr, u)
        vi = np.searchsorted(node_arr, v)
        if seeds is not None:
            seed_mask = pc.is_in(
                pa.array(node_arr), value_set=pa.array(sorted(seeds), pa.string())
            ).to_numpy(zero_copy_only=False)
        else:
            seed_mask = bfs_seed_mask(pa.array(node_arr), seed_pct).to_numpy(
                zero_copy_only=False
            )
        INF = np.iinfo(np.int64).max
        dist = np.where(seed_mask, 0, INF).astype(np.int64)
        for _ in range(max_hops):
            du = dist[ui]
            ok = du != INF
            cand = np.full(len(node_arr), INF, np.int64)
            np.minimum.at(cand, vi[ok], du[ok] + 1)
            dist = np.minimum(dist, cand)
        reached = dist != INF
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_arr[reached]),
                    "dist": pa.array(dist[reached], pa.int64()),
                }
            )
        ).sort("node")

    def seed_partial(part: pa.Table) -> pa.Table:
        nodes = pc.unique(part.column("u").combine_chunks())
        if seeds is not None:  # explicit single/few-source mode
            hit = pc.is_in(nodes, value_set=pa.array(sorted(seeds), pa.string()))
        else:
            hit = bfs_seed_mask(nodes, seed_pct)
        picked = nodes.filter(hit)
        return pa.table(
            {
                "node": picked,
                "dist": pa.array(np.zeros(len(picked), np.int64)),
            }
        )

    # node set = distinct u of the mirrored table (covers every endpoint);
    # distinct-per-partition is exact because the mirror step partitions by u
    dist = (
        edges.groupby("part")
        .map_groups(seed_partial, batch_format="pyarrow")
        .materialize()
    )

    cand_schema = pa.schema([("node", pa.string()), ("dist", pa.int64())])

    def dist_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": batch.column("node"),
                "v": batch.column("node"),
                "dist": batch.column("dist").cast(pa.int64()),
            }
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def edge_tag(batch: pa.Table) -> pa.Table:
        cols = ["u", "v", "part"] if "part" in batch.column_names else ["u", "v"]
        t = batch.select(cols)
        if "part" not in t.column_names:
            t = t.append_column("part", part_array(t, ["u"], n_parts))
        return t.append_column(
            "dist", pa.array(np.full(t.num_rows, -1, np.int64))
        ).select(["u", "v", "dist", "part"])

    def probe(part: pa.Table) -> pa.Table:
        d = part.column("dist").to_numpy(zero_copy_only=False)
        is_dist = d >= 0
        if not is_dist.any() or is_dist.all():
            return cand_schema.empty_table()
        dn = part.column("u").to_numpy(zero_copy_only=False)[is_dist].astype(str)
        dv = d[is_dist]
        order = np.argsort(dn, kind="mergesort")
        dn, dv = dn[order], dv[order]
        eu = part.column("u").to_numpy(zero_copy_only=False)[~is_dist].astype(str)
        pos = np.minimum(np.searchsorted(dn, eu), len(dn) - 1)
        hit = dn[pos] == eu
        if not hit.any():
            return cand_schema.empty_table()
        ev = part.column("v").filter(pa.array(~is_dist)).combine_chunks()
        t = pa.table(
            {
                "node": ev.filter(pa.array(hit)),
                "dist": pa.array(dv[pos[hit]] + 1, pa.int64()),
            }
        )
        # local min combine before the node exchange
        return (
            t.group_by(["node"]).aggregate([("dist", "min")]).rename_columns(["node", "dist"])
        )

    for _ in range(max_hops):
        tagged = edges.map_batches(edge_tag, batch_format="pyarrow").union(
            dist.map_batches(dist_tag, batch_format="pyarrow")
        )
        cand = tagged.groupby("part").map_groups(probe, batch_format="pyarrow")
        # repartition BEFORE materializing: the aggregate emits as many
        # blocks as it receives, and dist feeds next round's union — without
        # the bound, block count (and per-block scheduling overhead)
        # compounds exponentially across rounds (measured: 0.5→31 s/round
        # by round 6 on a 60-node graph)
        dist = (
            dist.union(cand)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .repartition(n_parts)
            .materialize()
        )

    return dist.sort("node")


# --- synchronous label propagation: community detection -----------------------

def label_propagation(adjacency: ray.data.Dataset, rounds: int = 3) -> ray.data.Dataset:
    """Community detection by SYNCHRONOUS label propagation over the
    undirected KG entity graph (Raghavan et al. 2007, the near-linear
    community baseline): every node starts as its own community; each
    round every node adopts the most frequent label among its neighbors,
    ties broken by lexicographically smallest label.  Exactly ``rounds``
    rounds run — the synchronous update plus deterministic tie-break
    makes the result independent of partitioning and block order, and a
    fixed-depth SQL unroll (join → count → windowed argmax per round)
    replays it exactly.

    Scale shape per round: labels exchange once through the static
    mirrored-edge partitions (searchsorted probe emits (neighbor, label)
    tallies pre-combined per partition), one (node, label) groupby sums
    the tallies, and the per-node argmax is one more keyed exchange
    resolved with a vectorized sort + first-of-run gather (the grouped-
    MODE kernel) — no per-node dispatch.  Exchange volume is O(edges)
    tallies per round, the LPA lower bound."""
    from ray.data.aggregate import Sum

    from .joins import hash_partitioned_groups

    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)
    edges = _undirected_both_dirs(adjacency, n_parts)

    # Small-graph planner (round 5): local synchronous LPA — identical
    # argmax/tie-break over exact integer tallies (tests); unchanged above.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.string()), "community": pa.array([], pa.string())})
            )
        et = pa.concat_tables(tabs)
        u = et.column("u").to_numpy(zero_copy_only=False)
        v = et.column("v").to_numpy(zero_copy_only=False)
        node_arr = np.unique(u)
        V = np.int64(len(node_arr))
        ui = np.searchsorted(node_arr, u).astype(np.int64)
        vi = np.searchsorted(node_arr, v).astype(np.int64)
        lab = np.arange(V, dtype=np.int64)  # label index == node index (sorted, so
        # index order IS lexicographic label order — the tie-break)
        for _ in range(rounds):
            # tally (node=v, label=lab[u]) over the mirrored rows
            key = vi * V + lab[ui]
            uk, cnt = np.unique(key, return_counts=True)
            kn, kl = uk // V, uk % V
            # per node: max cnt, tie -> smallest label index
            order = np.lexsort((kl, -cnt, kn))
            kn_s = kn[order]
            first = np.r_[True, kn_s[1:] != kn_s[:-1]]
            new_lab = lab.copy()
            new_lab[kn_s[first]] = kl[order][first]
            lab = new_lab
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_arr),
                    "community": pa.array(node_arr[lab]),
                }
            )
        ).sort("node")

    def init_labels(part: pa.Table) -> pa.Table:
        nodes = pc.unique(part.column("u").combine_chunks())
        return pa.table({"node": nodes, "label": nodes})

    labels = (
        edges.groupby("part").map_groups(init_labels, batch_format="pyarrow").materialize()
    )

    tally_schema = pa.schema(
        [("node", pa.string()), ("label", pa.string()), ("cnt", pa.int64())]
    )

    def label_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": batch.column("node"),
                "v": batch.column("label"),
                "side": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def edge_tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["u", "v"])
        t = t.append_column("side", pa.array(np.zeros(t.num_rows, np.int8)))
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def probe(part: pa.Table) -> pa.Table:
        side = part.column("side").to_numpy(zero_copy_only=False)
        is_lab = side == 1
        if not is_lab.any() or is_lab.all():
            return tally_schema.empty_table()
        ln = part.column("u").to_numpy(zero_copy_only=False)[is_lab].astype(str)
        lv = part.column("v").to_numpy(zero_copy_only=False)[is_lab].astype(str)
        order = np.argsort(ln, kind="mergesort")
        ln, lv = ln[order], lv[order]
        eu = part.column("u").to_numpy(zero_copy_only=False)[~is_lab].astype(str)
        pos = np.minimum(np.searchsorted(ln, eu), len(ln) - 1)
        hit = ln[pos] == eu
        if not hit.any():
            return tally_schema.empty_table()
        ev = part.column("v").filter(pa.array(~is_lab)).combine_chunks()
        t = pa.table(
            {
                "node": ev.filter(pa.array(hit)),
                "label": pa.array(lv[pos[hit]], pa.string()),
            }
        )
        g = t.group_by(["node", "label"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "node": g.column("node"),
                "label": g.column("label"),
                "cnt": g.column("count_all").cast(pa.int64()),
            }
        )

    def argmax_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.schema([("node", pa.string()), ("label", pa.string())]).empty_table()
        s = part.take(
            pc.sort_indices(
                part,
                sort_keys=[
                    ("node", "ascending"),
                    ("cnt", "descending"),
                    ("label", "ascending"),
                ],
            )
        )
        g = s.column("node").to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], g[1:] != g[:-1]])
        return s.filter(pa.array(first)).select(["node", "label"])

    for _ in range(rounds):
        tagged = edges.map_batches(edge_tag, batch_format="pyarrow").union(
            labels.map_batches(label_tag, batch_format="pyarrow")
        )
        tallies = (
            tagged.groupby("part")
            .map_groups(probe, batch_format="pyarrow")
            .groupby(["node", "label"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )
        # repartition bounds the label block count across rounds (labels
        # re-enter next round's union; see bfs_hops for the growth mode)
        labels = (
            hash_partitioned_groups(tallies, ["node"], argmax_part, n_parts)
            .repartition(n_parts)
            .materialize()
        )

    return labels.map_batches(
        lambda t: t.rename_columns(["node", "community"]), batch_format="pyarrow"
    ).sort("node")


# --- deterministic random walks: the DeepWalk corpus generator ---------------

def random_walks(adjacency: ray.data.Dataset, walk_len: int = 4) -> ray.data.Dataset:
    """DeepWalk-style random-walk corpus over the DIRECTED KG (Perozzi et
    al. 2014 — the sentence generator that turns a graph into skip-gram
    training data): every distinct source node starts one walk
    (walk_id = start node); at step t the walk at node c moves to
    ``sorted_out_neighbors(c)[ md5_u64(walk_id|c|t) % outdeg(c) ]`` and a
    walk at a node with no out-edges ends.  The neighbor choice is a pure
    hash — no RNG state — so the walk set is identical at any
    parallelism AND exactly replayable in SQL (row_number over sorted
    neighbors joined on the same md5-mod index).

    Scale shape: distinct (u, v) edges partition once by hash(u), sort
    per partition, and pin across steps; each step the frontier
    (walk_id, node) exchanges through the same hash, the per-partition
    probe finds each node's neighbor run with TWO searchsorted calls and
    gathers the picked neighbor by index arithmetic — the only per-row
    Python is the md5 draw itself (one digest per live walk per step,
    the portable-hash price every md5-keyed oracle pays).  Frontier
    volume is ≤ n_walks rows per step; the edge side never re-shuffles
    logically (re-unioned here; pin via ray.put below the PageRank
    bound is the stated cluster optimization)."""
    import hashlib

    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)

    def dedup(batch: pa.Table) -> pa.Table:
        t = (
            pa.table({"u": batch.column("src_id"), "v": batch.column("dst_id")})
            .group_by(["u", "v"])
            .aggregate([])
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def sort_part(part: pa.Table) -> pa.Table:
        d = part.select(["u", "v"]).group_by(["u", "v"]).aggregate([])
        d = d.sort_by([("u", "ascending"), ("v", "ascending")])
        return d.append_column("part", part_array(d, ["u"], n_parts))

    edges = (
        adjacency.map_batches(dedup, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sort_part, batch_format="pyarrow")
        .materialize()
    )

    # Small-graph planner (round 5): local walk simulation over the
    # globally sorted edge array — identical md5 draws, runs and step
    # ledger (tests); walk_pairs and kg_node_embeddings inherit via
    # composition.  Unchanged above the bound.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "walk_id": pa.array([], pa.string()),
                        "step": pa.array([], pa.int64()),
                        "node": pa.array([], pa.string()),
                    }
                )
            )
        et = pa.concat_tables(tabs).sort_by([("u", "ascending"), ("v", "ascending")])
        eu = et.column("u").to_numpy(zero_copy_only=False).astype(str)
        ev = et.column("v").to_numpy(zero_copy_only=False)
        wids = np.unique(eu)
        cur = wids.copy()
        alive = np.ones(len(wids), bool)
        w_col = [wids]
        s_col = [np.zeros(len(wids), np.int64)]
        n_col = [wids]
        for t in range(1, walk_len + 1):
            aw = np.flatnonzero(alive)
            if not len(aw):
                break
            c = cur[aw].astype(str)
            lo = np.searchsorted(eu, c, side="left")
            hi = np.searchsorted(eu, c, side="right")
            deg = hi - lo
            has = deg > 0
            alive[aw[~has]] = False
            aw = aw[has]
            if not len(aw):
                break
            c, lo, deg = c[has], lo[has], deg[has]
            wid = wids[aw]
            idx = np.fromiter(
                (
                    int(hashlib.md5(f"{w}|{cc}|{t}".encode()).hexdigest()[:16], 16) % int(d)
                    for w, cc, d in zip(wid, c, deg)
                ),
                dtype=np.int64,
                count=len(wid),
            )
            nxt = np.asarray(ev[lo + idx], dtype=object).astype(str)
            cur[aw] = nxt
            w_col.append(wid)
            s_col.append(np.full(len(aw), t, np.int64))
            n_col.append(nxt)
        return ray.data.from_arrow(
            pa.table(
                {
                    "walk_id": pa.array(np.concatenate(w_col).astype(object), pa.string()),
                    "step": pa.array(np.concatenate(s_col), pa.int64()),
                    "node": pa.array(np.concatenate(n_col).astype(object), pa.string()),
                }
            )
        ).sort(["walk_id", "step"])

    def starts_part(part: pa.Table) -> pa.Table:
        nodes = pc.unique(part.column("u").combine_chunks())
        return pa.table({"walk_id": nodes, "node": nodes})

    frontier = (
        edges.groupby("part").map_groups(starts_part, batch_format="pyarrow").materialize()
    )

    out_rows = [
        frontier.map_batches(
            lambda t: t.append_column("step", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow",
        )
    ]

    step_schema = pa.schema([("walk_id", pa.string()), ("node", pa.string())])

    def frontier_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": batch.column("node"),
                "v": batch.column("walk_id"),
                "side": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def edge_tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["u", "v", "part"])
        return t.append_column("side", pa.array(np.zeros(t.num_rows, np.int8))).select(
            ["u", "v", "side", "part"]
        )

    def make_step(t: int):
        def step_part(part: pa.Table) -> pa.Table:
            side = part.column("side").to_numpy(zero_copy_only=False)
            is_f = side == 1
            if not is_f.any() or is_f.all():
                return step_schema.empty_table()
            fe = part.filter(pa.array(~is_f))
            # edges arrive already sorted per partition, but the union may
            # interleave blocks — re-sort (cheap, partition-local)
            fe = fe.sort_by([("u", "ascending"), ("v", "ascending")])
            eu = fe.column("u").to_numpy(zero_copy_only=False).astype(str)
            cur = part.column("u").to_numpy(zero_copy_only=False)[is_f].astype(str)
            wid = part.column("v").to_numpy(zero_copy_only=False)[is_f].astype(str)
            lo = np.searchsorted(eu, cur, side="left")
            hi = np.searchsorted(eu, cur, side="right")
            deg = hi - lo
            alive = deg > 0
            if not alive.any():
                return step_schema.empty_table()
            cur, wid, lo, deg = cur[alive], wid[alive], lo[alive], deg[alive]
            # int(d): a 64-bit md5 int % np.int64 would silently promote to
            # float64 (value-based casting) and corrupt the low bits
            idx = np.fromiter(
                (
                    int(hashlib.md5(f"{w}|{c}|{t}".encode()).hexdigest()[:16], 16) % int(d)
                    for w, c, d in zip(wid, cur, deg)
                ),
                dtype=np.int64,
                count=len(wid),
            )
            picked = fe.column("v").take(pa.array(lo + idx, pa.int64()))
            return pa.table({"walk_id": pa.array(wid, pa.string()), "node": picked})

        return step_part

    for t in range(1, walk_len + 1):
        tagged = edges.map_batches(edge_tag, batch_format="pyarrow").union(
            frontier.map_batches(frontier_tag, batch_format="pyarrow")
        )
        # repartition bounds frontier blocks (frontier re-enters next
        # step's union; see bfs_hops for the growth mode)
        frontier = (
            tagged.groupby("part")
            .map_groups(make_step(t), batch_format="pyarrow")
            .repartition(n_parts)
            .materialize()
        )
        out_rows.append(
            frontier.map_batches(
                lambda b, _t=t: b.append_column(
                    "step", pa.array(np.full(b.num_rows, _t, np.int64))
                ),
                batch_format="pyarrow",
            )
        )

    out = out_rows[0]
    for part in out_rows[1:]:
        out = out.union(part)
    return out.map_batches(
        lambda b: b.select(["walk_id", "step", "node"]), batch_format="pyarrow"
    ).sort(["walk_id", "step"])


def walk_pairs(
    adjacency: ray.data.Dataset, walk_len: int = 4, window: int = 2
) -> ray.data.Dataset:
    """Skip-gram training pairs from the deterministic walk corpus (the
    DeepWalk co-occurrence statistic: which entities appear within
    ``window`` steps of each other on random walks — the input
    distribution :func:`kg_node_embeddings` factorizes): for every
    ordered pair of positions on the same walk at step distance
    1..window, one (center, context) count.

    Scale shape: walks exchange ONCE keyed by walk_id; within a
    partition each walk's step sequence is one sorted run and every
    offset d is a boundary-masked vectorized shift (the Markov-
    transition kernel), emitting both directions; per-partition Arrow
    hash-aggregate pre-combines before the final (center, context)
    groupby, so the exchange carries distinct-pair counts, not pair
    instances.  Exactly replayable in SQL (self-join on walk_id with
    |Δstep| ≤ window over the walk replay)."""
    from ray.data.aggregate import Sum

    from .joins import hash_partitioned_groups

    walks = random_walks(adjacency, walk_len=walk_len)
    n_parts = derive_n_parts(walks.count(), rows_per_part=65536)

    pair_schema = pa.schema(
        [("center", pa.string()), ("context", pa.string()), ("n", pa.int64())]
    )

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pair_schema.empty_table()
        s = part.sort_by([("walk_id", "ascending"), ("step", "ascending")])
        wid = s.column("walk_id").to_numpy(zero_copy_only=False).astype(str)
        node = s.column("node").to_numpy(zero_copy_only=False)
        cs, xs = [], []
        for d in range(1, window + 1):
            if len(wid) <= d:
                break
            same = wid[d:] == wid[:-d]  # steps are contiguous per walk
            a, b = node[:-d][same], node[d:][same]
            cs.append(a)
            xs.append(b)
            cs.append(b)
            xs.append(a)
        if not cs:
            return pair_schema.empty_table()
        t = pa.table(
            {
                "center": pa.array(np.concatenate(cs), pa.string()),
                "context": pa.array(np.concatenate(xs), pa.string()),
            }
        )
        g = t.group_by(["center", "context"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "center": g.column("center"),
                "context": g.column("context"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    partials = hash_partitioned_groups(walks, ["walk_id"], per_part, n_parts)
    return (
        partials.groupby(["center", "context"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["center", "context"])
    )


def kg_node_embeddings(
    adjacency: ray.data.Dataset,
    dim: int = 16,
    walk_len: int = 8,
    window: int = 2,
    epochs: int = 5,
    lr: float = 0.05,
    neg: int = 5,
    seed: int = 7,
    n_shards: int | None = None,
) -> tuple[list[str], np.ndarray]:
    """DeepWalk KG entity embeddings (Perozzi et al. 2014): deterministic
    random walks → skip-gram pairs → SGNS — the graph-representation
    pipeline a KG engine feeds to link-prediction / clustering consumers.
    Returns (nodes, [V, dim] float32) in sorted-node order.

    Reuses the engine's proven SGNS machinery end-to-end
    (functions/training.py train_skipgram / train_skipgram_sharded —
    the same code path the SemEval embedding-init lever runs): pair
    generation is fully distributed (:func:`walk_pairs`, SQL-oracle-
    exact); the default fit collects the DISTINCT-pair count table
    (bounded by co-occurring entity pairs, not walk volume) and runs the
    deterministic driver SGNS over the expanded multiset; ``n_shards``
    switches to the parameter-averaged object-store path for vocabularies
    that dwarf driver memory.  The entity vocabulary is O(V·dim) driver
    state — the same budget as the T5 word2vec broadcast table."""
    from .training import train_skipgram

    pairs = walk_pairs(adjacency, walk_len=walk_len, window=window)
    rows = pairs.take_all()  # distinct weighted pairs, pre-combined
    nodes = sorted({r["center"] for r in rows} | {r["context"] for r in rows})
    node2id = {n: i for i, n in enumerate(nodes)}
    if not rows:
        return nodes, np.zeros((0, dim), np.float32)
    centers = np.repeat(
        np.array([node2id[r["center"]] for r in rows], np.int64),
        np.array([r["n"] for r in rows], np.int64),
    )
    contexts = np.repeat(
        np.array([node2id[r["context"]] for r in rows], np.int64),
        np.array([r["n"] for r in rows], np.int64),
    )
    emb = train_skipgram(
        centers, contexts, len(nodes), dim=dim, epochs=epochs, neg=neg, lr=lr, seed=seed
    )
    return nodes, emb


# --- weighted SSSP: Bellman-Ford relaxation from the BFS landmarks -----------

def sssp_hops(
    adjacency: ray.data.Dataset, seed_pct: int = 5, rounds: int = 6
) -> ray.data.Dataset:
    """Weighted single-source-set shortest paths (synchronous
    Bellman-Ford) over the undirected KG entity graph: edge length is the
    summed mention weight between the pair (both directions), sources are
    the same md5-bucket landmark set as :func:`bfs_hops`, and each round
    relaxes ``dist'(v) = min(dist(v), min_u dist(u) + w(u,v))``.  All
    integer, monotone min — exactly ``rounds`` rounds run, a fixed-depth
    SQL unroll compares exactly, extra rounds past convergence are
    no-ops.  Same per-round shape as bfs_hops (static pinned edges, one
    dist exchange, searchsorted probe, groupby-min) with the weight
    riding the edge rows."""
    from ray.data.aggregate import Min

    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)

    def canon(batch: pa.Table) -> pa.Table:
        u, v = batch.column("src_id"), batch.column("dst_id")
        w = batch.column("weight").cast(pa.int64())
        keep = pc.invert(pc.equal(u, v))
        u, v, w = u.filter(keep), v.filter(keep), w.filter(keep)
        t = (
            pa.table(
                {"a": pc.min_element_wise(u, v), "b": pc.max_element_wise(u, v), "w": w}
            )
            .group_by(["a", "b"])
            .aggregate([("w", "sum")])
            .rename_columns(["a", "b", "w"])
        )
        return t.append_column("part", part_array(t, ["a", "b"], n_parts))

    def mirror(part: pa.Table) -> pa.Table:
        d = (
            part.select(["a", "b", "w"])
            .group_by(["a", "b"])
            .aggregate([("w", "sum")])
            .rename_columns(["a", "b", "w"])
        )
        a, b = d.column("a").combine_chunks(), d.column("b").combine_chunks()
        w = d.column("w").combine_chunks()
        t = pa.table(
            {
                "u": pa.concat_arrays([a, b]),
                "v": pa.concat_arrays([b, a]),
                "w": pa.concat_arrays([w, w]),
            }
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    edges = (
        adjacency.map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(mirror, batch_format="pyarrow")
        .materialize()
    )

    # Small-graph planner (round 5): local synchronous Bellman-Ford over
    # the gathered mirrored weighted edges — exactly ``rounds`` rounds,
    # bit-equal to the distributed exchanges (tests); unchanged above.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.string()), "dist": pa.array([], pa.int64())})
            )
        et = pa.concat_tables(tabs)
        u = et.column("u").to_numpy(zero_copy_only=False)
        v = et.column("v").to_numpy(zero_copy_only=False)
        w = et.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        node_arr = np.unique(u)
        ui = np.searchsorted(node_arr, u)
        vi = np.searchsorted(node_arr, v)
        seed_mask = bfs_seed_mask(pa.array(node_arr), seed_pct).to_numpy(
            zero_copy_only=False
        )
        INF = np.iinfo(np.int64).max
        dist = np.where(seed_mask, 0, INF).astype(np.int64)
        for _ in range(rounds):
            du = dist[ui]
            ok = du != INF
            cand = np.full(len(node_arr), INF, np.int64)
            np.minimum.at(cand, vi[ok], du[ok] + w[ok])
            dist = np.minimum(dist, cand)
        reached = dist != INF
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_arr[reached]),
                    "dist": pa.array(dist[reached], pa.int64()),
                }
            )
        ).sort("node")

    def seed_partial(part: pa.Table) -> pa.Table:
        nodes = pc.unique(part.column("u").combine_chunks())
        picked = nodes.filter(bfs_seed_mask(nodes, seed_pct))
        return pa.table(
            {"node": picked, "dist": pa.array(np.zeros(len(picked), np.int64))}
        )

    dist = (
        edges.groupby("part").map_groups(seed_partial, batch_format="pyarrow").materialize()
    )

    cand_schema = pa.schema([("node", pa.string()), ("dist", pa.int64())])

    def dist_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": batch.column("node"),
                "v": batch.column("node"),
                "w": pa.array(np.full(batch.num_rows, -1, np.int64)),
                "dist": batch.column("dist").cast(pa.int64()),
            }
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def edge_tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["u", "v", "w", "part"])
        return t.append_column(
            "dist", pa.array(np.full(t.num_rows, -1, np.int64))
        ).select(["u", "v", "w", "dist", "part"])

    def probe(part: pa.Table) -> pa.Table:
        d = part.column("dist").to_numpy(zero_copy_only=False)
        is_dist = d >= 0
        if not is_dist.any() or is_dist.all():
            return cand_schema.empty_table()
        dn = part.column("u").to_numpy(zero_copy_only=False)[is_dist].astype(str)
        dv = d[is_dist]
        order = np.argsort(dn, kind="mergesort")
        dn, dv = dn[order], dv[order]
        eu = part.column("u").to_numpy(zero_copy_only=False)[~is_dist].astype(str)
        ew = part.column("w").to_numpy(zero_copy_only=False)[~is_dist]
        pos = np.minimum(np.searchsorted(dn, eu), len(dn) - 1)
        hit = dn[pos] == eu
        if not hit.any():
            return cand_schema.empty_table()
        ev = part.column("v").filter(pa.array(~is_dist)).combine_chunks()
        t = pa.table(
            {
                "node": ev.filter(pa.array(hit)),
                "dist": pa.array(dv[pos[hit]] + ew[hit], pa.int64()),
            }
        )
        return (
            t.group_by(["node"]).aggregate([("dist", "min")]).rename_columns(["node", "dist"])
        )

    for _ in range(rounds):
        tagged = edges.map_batches(edge_tag, batch_format="pyarrow").union(
            dist.map_batches(dist_tag, batch_format="pyarrow")
        )
        cand = tagged.groupby("part").map_groups(probe, batch_format="pyarrow")
        dist = (
            dist.union(cand)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .repartition(n_parts)  # block-count bound (see bfs_hops)
            .materialize()
        )

    return dist.sort("node")


# --- GNN minibatch sampling: k-hop deterministic fanout ----------------------

def fanout_sample(
    adjacency: ray.data.Dataset,
    seed_pct: int = 5,
    fanouts: tuple[int, ...] = (3, 2),
) -> ray.data.Dataset:
    """GraphSAGE-style k-hop neighborhood sampling (Hamilton et al. 2017
    — the minibatch subgraph generator of every sampled-GNN trainer):
    starting from the md5-bucket seed entities, hop h keeps at most
    ``fanouts[h]`` out-neighbors per frontier node — the neighbors with
    the SMALLEST md5_u64('fan:'+u+'|'+v+'|'+h) — and emits the sampled
    edges (hop, src, dst).  The per-(edge, hop) hash makes the sample a
    pure function of the graph: reproducible at any parallelism and
    exactly replayable in SQL (row_number over the hash ≤ fanout).
    Frontier dedup per hop keeps the expansion set-valued (a node
    reached twice expands once).

    Scale shape: distinct directed edges partition once by hash(src) and
    pin; each hop the frontier exchanges through the same hash, the
    per-partition probe finds each node's run with two searchsorted
    calls, ranks candidates with ONE vectorized argsort over
    (node, hash) and keeps rank ≤ fanout — per-hop exchange volume is
    the frontier, and emitted edges are ≤ |frontier|·fanout by
    construction (the sampling bound that makes 10¹²-edge graphs
    trainable)."""
    import hashlib

    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)

    def dedup(batch: pa.Table) -> pa.Table:
        t = (
            pa.table({"u": batch.column("src_id"), "v": batch.column("dst_id")})
            .group_by(["u", "v"])
            .aggregate([])
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def sort_part(part: pa.Table) -> pa.Table:
        d = part.select(["u", "v"]).group_by(["u", "v"]).aggregate([])
        d = d.sort_by([("u", "ascending"), ("v", "ascending")])
        return d.append_column("part", part_array(d, ["u"], n_parts))

    edges = (
        adjacency.map_batches(dedup, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sort_part, batch_format="pyarrow")
        .materialize()
    )

    # Small-graph planner (round 5): local hop simulation — identical
    # md5 ranking, fanout cut and set-valued frontier dedup (tests).
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        out_schema_l = pa.schema(
            [("hop", pa.int64()), ("src", pa.string()), ("dst", pa.string())]
        )
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(out_schema_l.empty_table())
        et = pa.concat_tables(tabs).sort_by([("u", "ascending"), ("v", "ascending")])
        eu = et.column("u").to_numpy(zero_copy_only=False).astype(str)
        ev = et.column("v").to_numpy(zero_copy_only=False).astype(str)
        uniq = np.unique(eu)
        cur = uniq[bfs_seed_mask(pa.array(uniq), seed_pct).to_numpy(zero_copy_only=False)]
        hop_col, src_col, dst_col = [], [], []
        for h, fanout in enumerate(fanouts):
            cur = np.unique(cur.astype(str))
            lo = np.searchsorted(eu, cur, side="left")
            hi = np.searchsorted(eu, cur, side="right")
            nxt = []
            for c, a_, b_ in zip(cur, lo, hi):
                if a_ == b_:
                    continue
                cand = ev[a_:b_]
                hs = np.fromiter(
                    (
                        int(hashlib.md5(f"fan:{c}|{x}|{h}".encode()).hexdigest()[:16], 16)
                        for x in cand
                    ),
                    dtype=np.uint64,
                    count=len(cand),
                )
                order = np.lexsort((cand, hs))[:fanout]
                picked = cand[order]
                hop_col.append(np.full(len(order), h, np.int64))
                src_col.append(np.full(len(order), c, dtype=object))
                dst_col.append(picked)
                nxt.append(picked)
            cur = np.concatenate(nxt) if nxt else np.array([], dtype=object)
        if not hop_col:
            return ray.data.from_arrow(out_schema_l.empty_table())
        return ray.data.from_arrow(
            pa.table(
                {
                    "hop": pa.array(np.concatenate(hop_col), pa.int64()),
                    "src": pa.array(list(np.concatenate(src_col)), pa.string()),
                    "dst": pa.array(list(np.concatenate(dst_col)), pa.string()),
                },
                schema=out_schema_l,
            )
        ).sort(["hop", "src", "dst"])

    def seeds_part(part: pa.Table) -> pa.Table:
        nodes = pc.unique(part.column("u").combine_chunks())
        return pa.table({"node": nodes.filter(bfs_seed_mask(nodes, seed_pct))})

    frontier = (
        edges.groupby("part").map_groups(seeds_part, batch_format="pyarrow").materialize()
    )

    out_schema = pa.schema(
        [("hop", pa.int64()), ("src", pa.string()), ("dst", pa.string())]
    )
    sampled_hops: list[ray.data.Dataset] = []

    def frontier_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": batch.column("node"),
                "v": batch.column("node"),
                "side": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def edge_tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["u", "v", "part"])
        return t.append_column("side", pa.array(np.zeros(t.num_rows, np.int8))).select(
            ["u", "v", "side", "part"]
        )

    def make_hop(h: int, fanout: int):
        def hop_part(part: pa.Table) -> pa.Table:
            side = part.column("side").to_numpy(zero_copy_only=False)
            is_f = side == 1
            if not is_f.any() or is_f.all():
                return out_schema.empty_table()
            fe = part.filter(pa.array(~is_f)).sort_by(
                [("u", "ascending"), ("v", "ascending")]
            )
            eu = fe.column("u").to_numpy(zero_copy_only=False).astype(str)
            ev = fe.column("v").to_numpy(zero_copy_only=False).astype(str)
            cur = np.unique(
                part.column("u").to_numpy(zero_copy_only=False)[is_f].astype(str)
            )
            lo = np.searchsorted(eu, cur, side="left")
            hi = np.searchsorted(eu, cur, side="right")
            keep_src, keep_dst = [], []
            # per frontier node: rank its run by the edge hash, keep top-f
            # (runs are outdeg-sized; the md5 per candidate edge is the
            # portable-hash price — one digest per candidate, candidates
            # bounded by frontier × outdeg of the frontier only)
            for c, a, b in zip(cur, lo, hi):
                if a == b:
                    continue
                cand = ev[a:b]
                hs = np.fromiter(
                    (
                        int(
                            hashlib.md5(f"fan:{c}|{x}|{h}".encode()).hexdigest()[:16],
                            16,
                        )
                        for x in cand
                    ),
                    dtype=np.uint64,
                    count=len(cand),
                )
                order = np.lexsort((cand, hs))[:fanout]
                keep_src.append(np.full(len(order), c, dtype=object))
                keep_dst.append(cand[order])
            if not keep_src:
                return out_schema.empty_table()
            src = np.concatenate(keep_src)
            dst = np.concatenate(keep_dst)
            return pa.table(
                {
                    "hop": pa.array(np.full(len(src), h, np.int64)),
                    "src": pa.array(list(src), pa.string()),
                    "dst": pa.array(list(dst), pa.string()),
                },
                schema=out_schema,
            )

        return hop_part

    for h, f in enumerate(fanouts):
        tagged = edges.map_batches(edge_tag, batch_format="pyarrow").union(
            frontier.map_batches(frontier_tag, batch_format="pyarrow")
        )
        hop_edges = (
            tagged.groupby("part")
            .map_groups(make_hop(h, f), batch_format="pyarrow")
            .repartition(n_parts)  # block-count bound (see bfs_hops)
            .materialize()
        )
        sampled_hops.append(hop_edges)

        def next_frontier(batch: pa.Table) -> pa.Table:
            return pa.table({"node": pc.unique(batch.column("dst").combine_chunks())})

        # dedup across partitions: one keyed pass (set-valued frontier)
        frontier = (
            hop_edges.map_batches(next_frontier, batch_format="pyarrow")
            .groupby("node")
            .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
            .repartition(n_parts)
            .materialize()
        )

    out = sampled_hops[0]
    for d in sampled_hops[1:]:
        out = out.union(d)
    return out.sort(["hop", "src", "dst"])


def modularity(
    adjacency: ray.data.Dataset, communities: ray.data.Dataset
) -> ray.data.Dataset:
    """Newman modularity Q of a community assignment over the undirected
    simple KG entity graph — the partition-quality number that tells you
    whether :func:`label_propagation` found structure or noise:
    Q = Σ_c (m_c/m − (D_c/2m)²) with m the undirected edge count, m_c
    the intra-community edges and D_c the community's degree sum.
    Computed EXACTLY as the rational (4·m·Σm_c − ΣD_c²) / (4m²) from
    integer sufficient statistics, one fixed IEEE final form
    (floor(num/den·1e9 + 0.5)).  Output one row:
    (n_edges, n_communities, q_nano).

    Scale shape: distinct canonical (a,b) edges flow through one keyed
    dedup exchange; community labels attach with TWO side-tagged
    node-keyed exchanges (searchsorted probe per partition — the
    label_propagation join shape, never a broadcast of the label
    table); per-batch partials fold every labeled edge to ≤ |C| (c,
    m_c, D_c) counter rows before the final aggregate-sized groupby.
    The driver sees only community counters, never edges."""
    import math

    from ray.data.aggregate import Sum

    from .joins import hash_partitioned_groups

    n_parts = derive_n_parts(adjacency.count(), rows_per_part=65536)

    def canon(batch: pa.Table) -> pa.Table:
        u, v = batch.column("src_id"), batch.column("dst_id")
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        t = pa.table({"a": pc.min_element_wise(u, v), "b": pc.max_element_wise(u, v)})
        return t.group_by(["a", "b"]).aggregate([])

    def dedup(part: pa.Table) -> pa.Table:
        return part.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    edges = hash_partitioned_groups(
        adjacency.map_batches(canon, batch_format="pyarrow"), ["a", "b"], dedup, n_parts
    )

    # Small-graph planner (round 5): local integer sufficient stats —
    # identical finalize expression (tests); unchanged above the bound.
    edges = edges.materialize()
    comm = communities.materialize()
    if edges.size_bytes() + comm.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "n_edges": pa.array([0], pa.int64()),
                        "n_communities": pa.array([0], pa.int64()),
                        "q_nano": pa.array([0], pa.int64()),
                    }
                )
            )
        et = pa.concat_tables(tabs)
        a = et.column("a").to_pylist()
        b = et.column("b").to_pylist()
        lab = {}
        for bt in comm.iter_batches(batch_format="pyarrow"):
            lab.update(zip(bt.column("node").to_pylist(), bt.column("community").to_pylist()))
        d_of: dict = {}
        mc_of: dict = {}
        for x, y in zip(a, b):
            ca = lab.get(x, x)  # self-label fallback (the attach semantics)
            cb = lab.get(y, y)
            d_of[ca] = d_of.get(ca, 0) + 1
            d_of[cb] = d_of.get(cb, 0) + 1
            if ca == cb:
                mc_of[ca] = mc_of.get(ca, 0) + 1
        m = sum(d_of.values()) // 2
        sum_mc = sum(mc_of.values())
        sd2 = sum(d * d for d in d_of.values())
        n_comm = len(d_of)
        if m > 0:
            num = 4 * m * sum_mc - sd2
            den = 4 * m * m
            q_nano = int(math.floor(num / den * 1e9 + 0.5))
        else:
            q_nano = 0
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_edges": pa.array([m], pa.int64()),
                    "n_communities": pa.array([n_comm], pa.int64()),
                    "q_nano": pa.array([q_nano], pa.int64()),
                }
            )
        )
    communities = comm

    def attach_label(
        keyed: ray.data.Dataset, cols: list[str], key: str, out: str
    ) -> ray.data.Dataset:
        """One side-tagged exchange keyed on ``key``: label rows carry
        (node → community), edge rows pick their key's label via a
        per-partition searchsorted probe (self-label fallback).
        ``cols`` is the edge side's payload schema (all string)."""

        def tag_lab(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    **{c: pa.nulls(batch.num_rows, pa.string()) for c in cols},
                    key: batch.column("node"),
                    "_lab": batch.column("community"),
                }
            )

        def tag_edge(batch: pa.Table) -> pa.Table:
            if "part" in batch.column_names:
                batch = batch.drop_columns(["part"])
            return batch.append_column("_lab", pa.nulls(batch.num_rows, pa.string()))

        tagged = keyed.map_batches(tag_edge, batch_format="pyarrow").union(
            communities.map_batches(tag_lab, batch_format="pyarrow")
        )

        def probe(part: pa.Table) -> pa.Table:
            lab_mask = pc.is_valid(part.column("_lab")).to_numpy(zero_copy_only=False)
            keys = part.column(key).to_numpy(zero_copy_only=False).astype(str)
            labs = part.column("_lab").to_numpy(zero_copy_only=False)
            ln, lv = keys[lab_mask], labs[lab_mask].astype(str)
            order = np.argsort(ln, kind="mergesort")
            ln, lv = ln[order], lv[order]
            epart = part.filter(pa.array(~lab_mask)).drop_columns(["_lab"])
            ek = keys[~lab_mask]
            if len(ln):
                pos = np.minimum(np.searchsorted(ln, ek), len(ln) - 1)
                hit = ln[pos] == ek
                got = np.where(hit, lv[pos], ek)  # self-label fallback
            else:
                got = ek
            if "part" in epart.column_names:
                epart = epart.drop_columns(["part"])
            return epart.append_column(out, pa.array(got, pa.string()))

        return hash_partitioned_groups(tagged, [key], probe, n_parts)

    labeled = attach_label(
        attach_label(edges, ["a", "b"], "a", "ca"), ["a", "b", "ca"], "b", "cb"
    )

    def partial(batch: pa.Table) -> pa.Table:
        ca = batch.column("ca").to_numpy(zero_copy_only=False).astype(str)
        cb = batch.column("cb").to_numpy(zero_copy_only=False).astype(str)
        same = ca == cb
        t = pa.table(
            {
                "c": pa.array(np.concatenate([ca, cb]), pa.string()),
                "d": pa.array(np.ones(2 * len(ca), np.int64)),
                "mc": pa.array(
                    np.concatenate([same.astype(np.int64), np.zeros(len(cb), np.int64)])
                ),
            }
        )
        g = t.group_by("c").aggregate([("d", "sum"), ("mc", "sum")])
        return pa.table(
            {
                "c": g.column("c"),
                "d": g.column("d_sum").cast(pa.int64()),
                "mc": g.column("mc_sum").cast(pa.int64()),
            }
        )

    folded = (
        labeled.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("d", alias_name="d"), Sum("mc", alias_name="mc"))
        .take_all()
    )  # ≤ |communities| counter rows
    m = sum(r["d"] for r in folded) // 2
    sum_mc = sum(r["mc"] for r in folded)
    sd2 = sum(r["d"] * r["d"] for r in folded)
    n_comm = len(folded)
    if m > 0:
        num = 4 * m * sum_mc - sd2
        den = 4 * m * m
        q_nano = int(math.floor(num / den * 1e9 + 0.5))
    else:
        q_nano = 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([m], pa.int64()),
                "n_communities": pa.array([n_comm], pa.int64()),
                "q_nano": pa.array([q_nano], pa.int64()),
            }
        )
    )


def degree_assortativity(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Newman degree assortativity r of the undirected simple KG entity
    graph — the hub-mixing diagnostic (do high-degree entities link to
    other hubs, r > 0, or to leaves, r < 0?) that predicts whether the
    canonicalize/groupby stages face correlated or dispersed skew.
    r is the Pearson correlation of (deg u, deg v) over the DIRECTED
    pair multiset containing both orientations of every undirected
    edge; that multiset is symmetric, so Σx = Σy and Σx² = Σy² and the
    whole statistic reduces to three integer sufficient sums over the
    canonical (a < b) edge set:
    n = 2m, sx = Σ(da+db), sxx = Σ(da²+db²), sxy = 2Σ(da·db),
    finished once on the driver with arbitrary-precision ints in the
    corr_price_qty fixed IEEE form — floor(num/(√a·√b)·1e9+0.5) — so
    the result is bit-exact against the HUGEINT SQL replay.  Output one
    row: (n_edges, n_nodes, r_nano); a degree-regular graph (zero
    variance) reports r_nano = 0 by convention.

    Scale shape: distinct canonical edges flow through one keyed dedup
    exchange; degrees are a combine-fed endpoint value_counts groupby
    (≤ distinct nodes per batch cross the wire); degrees attach to the
    two endpoints via TWO side-tagged node-keyed exchanges with a
    per-partition searchsorted probe (the modularity label-join shape —
    the degree table is never broadcast); each labeled batch then folds
    to ONE integer 4-tuple, so the final exchange is four numbers per
    block at any graph size."""
    import math

    from ray.data.aggregate import Sum

    from .joins import hash_partitioned_groups

    n_parts = derive_n_parts(adjacency.count(), rows_per_part=65536)

    def canon(batch: pa.Table) -> pa.Table:
        u, v = batch.column("src_id"), batch.column("dst_id")
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        t = pa.table({"a": pc.min_element_wise(u, v), "b": pc.max_element_wise(u, v)})
        return t.group_by(["a", "b"]).aggregate([])

    def dedup(part: pa.Table) -> pa.Table:
        return part.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    edges = hash_partitioned_groups(
        adjacency.map_batches(canon, batch_format="pyarrow"), ["a", "b"], dedup, n_parts
    ).materialize()

    def degree_partial(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [
                batch.column("a").combine_chunks().cast(pa.string()),
                batch.column("b").combine_chunks().cast(pa.string()),
            ]
        )
        vc = pc.value_counts(both)
        return pa.table(
            {"node": vc.field("values"), "d": vc.field("counts").cast(pa.int64())}
        )

    deg = (
        edges.map_batches(degree_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
        .materialize()
    )

    # Small-graph planner (round 5): local integer sufficient stats with
    # the identical fixed IEEE finalize (tests); unchanged above.
    edges = edges.materialize()
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "n_edges": pa.array([0], pa.int64()),
                        "n_nodes": pa.array([0], pa.int64()),
                        "r_nano": pa.array([0], pa.int64()),
                    }
                )
            )
        et = pa.concat_tables(tabs)
        ea = et.column("a").to_numpy(zero_copy_only=False)
        eb = et.column("b").to_numpy(zero_copy_only=False)
        node_arr = np.unique(np.concatenate([ea, eb]))
        ai = np.searchsorted(node_arr, ea)
        bi = np.searchsorted(node_arr, eb)
        degv = np.bincount(np.concatenate([ai, bi]), minlength=len(node_arr)).astype(np.int64)
        x = degv[ai]
        y = degv[bi]
        n = 2 * len(x)
        sx = int(x.sum()) + int(y.sum())
        sxx = int((x * x).sum()) + int((y * y).sum())
        sxy = 2 * int((x * y).sum())
        num = n * sxy - sx * sx
        a_ = n * sxx - sx * sx
        if a_ > 0:
            r = float(num) / (np.sqrt(float(a_)) * np.sqrt(float(a_)))
            r_nano = int(math.floor(r * 1e9 + 0.5))
        else:
            r_nano = 0
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_edges": pa.array([n // 2], pa.int64()),
                    "n_nodes": pa.array([len(node_arr)], pa.int64()),
                    "r_nano": pa.array([r_nano], pa.int64()),
                }
            )
        )
    n_nodes = deg.count()

    def attach_deg(
        keyed: ray.data.Dataset, payload: list[tuple[str, pa.DataType]], key: str, out: str
    ) -> ray.data.Dataset:
        """One side-tagged exchange keyed on ``key``: degree rows carry
        (node → deg), edge rows pick their key's degree via a
        per-partition searchsorted probe.  ``payload`` is the edge
        side's (name, type) schema."""

        def tag_deg(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    **{
                        c: (
                            batch.column("node")
                            if c == key
                            else pa.nulls(batch.num_rows, t)
                        )
                        for c, t in payload
                    },
                    "_deg": batch.column("deg").cast(pa.int64()),
                }
            )

        def tag_edge(batch: pa.Table) -> pa.Table:
            if "part" in batch.column_names:
                batch = batch.drop_columns(["part"])
            return batch.append_column("_deg", pa.nulls(batch.num_rows, pa.int64()))

        tagged = keyed.map_batches(tag_edge, batch_format="pyarrow").union(
            deg.map_batches(tag_deg, batch_format="pyarrow")
        )

        def probe(part: pa.Table) -> pa.Table:
            lab_mask = pc.is_valid(part.column("_deg")).to_numpy(zero_copy_only=False)
            keys = part.column(key).to_numpy(zero_copy_only=False).astype(str)
            vals = part.column("_deg").to_numpy(zero_copy_only=False)
            ln = keys[lab_mask]
            lv = vals[lab_mask].astype(np.int64)
            order = np.argsort(ln, kind="mergesort")
            ln, lv = ln[order], lv[order]
            epart = part.filter(pa.array(~lab_mask)).drop_columns(["_deg"])
            ek = keys[~lab_mask]
            if len(ln):
                pos = np.minimum(np.searchsorted(ln, ek), len(ln) - 1)
                hit = ln[pos] == ek
                got = np.where(hit, lv[pos], 0).astype(np.int64)
            else:
                got = np.zeros(len(ek), np.int64)
            if "part" in epart.column_names:
                epart = epart.drop_columns(["part"])
            return epart.append_column(out, pa.array(got, pa.int64()))

        return hash_partitioned_groups(tagged, [key], probe, n_parts)

    labeled = attach_deg(
        attach_deg(edges, [("a", pa.string()), ("b", pa.string())], "a", "da"),
        [("a", pa.string()), ("b", pa.string()), ("da", pa.int64())],
        "b",
        "db",
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("da").to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column("db").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([2 * len(x)], pa.int64()),
                "sx": pa.array([int(x.sum()) + int(y.sum())], pa.int64()),
                "sxx": pa.array(
                    [int((x * x).sum()) + int((y * y).sum())], pa.int64()
                ),
                "sxy": pa.array([2 * int((x * y).sum())], pa.int64()),
            }
        )

    stats = (
        labeled.map_batches(partial, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
        or {}
    )
    n = int(stats.get("n") or 0)
    sx = int(stats.get("sx") or 0)
    sxx = int(stats.get("sxx") or 0)
    sxy = int(stats.get("sxy") or 0)
    num = n * sxy - sx * sx  # exact python ints
    a = n * sxx - sx * sx  # = b (symmetric multiset)
    if a > 0:
        r = float(num) / (np.sqrt(float(a)) * np.sqrt(float(a)))
        r_nano = int(math.floor(r * 1e9 + 0.5))
    else:
        r_nano = 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([n // 2], pa.int64()),
                "n_nodes": pa.array([n_nodes], pa.int64()),
                "r_nano": pa.array([r_nano], pa.int64()),
            }
        )
    )


def clustering_coefficient(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Per-node local clustering coefficient of the undirected simple
    KG entity graph — for each node its degree, triangle count and
    ``C(v) = 2·t(v) / (deg·(deg−1))`` in exact integer milli-units (the
    neighborhood-density score that separates tight entity communities
    from hub spokes; deg ≤ 1 reports 0 by convention).

    Composition, not new machinery: :func:`edge_jaccard` already emits
    per-edge common-neighbor counts (= triangles through the edge) via
    the degree-ordered wedge exchange; each triangle through v is
    counted by exactly its TWO incident edges at v, so
    Σ_{u∈N(v)} cn(v,u) = 2·t(v).  Each edge row explodes to its two
    endpoints, per-batch Arrow partials fold (node → Σcn, deg) before
    ONE node-keyed aggregate, and the milli rounding is pure integer
    arithmetic — ``(2000·Σcn + d) // (2d)``, d = deg·(deg−1) — so the
    SQL replay is value-exact.  Exchange volume ≤ distinct nodes per
    batch; isolated nodes never appear (no edges)."""
    from ray.data.aggregate import Max, Sum

    ej = edge_jaccard(adjacency)

    def explode(batch: pa.Table) -> pa.Table:
        node = pa.concat_arrays(
            [
                batch.column("node_a").combine_chunks().cast(pa.string()),
                batch.column("node_b").combine_chunks().cast(pa.string()),
            ]
        )
        deg = pa.concat_arrays(
            [
                batch.column("deg_a").combine_chunks().cast(pa.int64()),
                batch.column("deg_b").combine_chunks().cast(pa.int64()),
            ]
        )
        cn = batch.column("n_common").combine_chunks().cast(pa.int64())
        t = pa.table({"node": node, "deg": deg, "cn": pa.concat_arrays([cn, cn])})
        g = t.group_by("node").aggregate([("cn", "sum"), ("deg", "max")])
        return pa.table(
            {
                "node": g.column("node"),
                "cn": g.column("cn_sum").cast(pa.int64()),
                "deg": g.column("deg_max").cast(pa.int64()),
            }
        )

    folded = (
        ej.map_batches(explode, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("cn", alias_name="cn"), Max("deg", alias_name="deg"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        cn = batch.column("cn").to_numpy(zero_copy_only=False).astype(np.int64)
        deg = batch.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        d = deg * (deg - 1)
        coef = np.where(d > 0, (2000 * cn + d) // np.maximum(2 * d, 1), 0)
        return pa.table(
            {
                "node": batch.column("node"),
                "deg": pa.array(deg, pa.int64()),
                "n_tri": pa.array(cn // 2, pa.int64()),
                "coef_milli": pa.array(coef.astype(np.int64), pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


def reciprocity(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Edge reciprocity of the directed simple KG graph (self-loops
    dropped, predicates collapsed): the fraction of distinct directed
    edges whose reverse edge also exists — the does-linking-run-both-ways
    diagnostic that separates citation-shaped KGs from social-shaped
    ones.  One row: (n_directed, n_reciprocated, reciprocity_milli) with
    the exact integer rounding floor(1000·r/d + 0.5) = (2000·r + d) //
    (2d).

    Scale shape: each batch dedups its directed edges and folds them to
    canonical (a, b, fwd, rev) bit rows (Arrow group_by max — ≤ distinct
    pairs per batch cross the wire); ONE pair-keyed exchange ORs the
    direction bits per pair and emits TWO integer counter rows per
    partition (directed count = Σ fwd+rev, reciprocated = 2·Σ fwd∧rev);
    the driver folds a partitions-sized table."""
    from ray.data.aggregate import Sum

    from .joins import hash_partitioned_groups

    n_parts = derive_n_parts(adjacency.count(), rows_per_part=65536)

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("src_id").cast(pa.string())
        v = batch.column("dst_id").cast(pa.string())
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        fwd = pc.less(u, v)
        t = pa.table(
            {
                "a": pc.min_element_wise(u, v),
                "b": pc.max_element_wise(u, v),
                "fwd": fwd.cast(pa.int64()),
                "rev": pc.invert(fwd).cast(pa.int64()),
            }
        )
        g = t.group_by(["a", "b"]).aggregate([("fwd", "max"), ("rev", "max")])
        return g.rename_columns(["a", "b", "fwd", "rev"])

    cnt_schema = pa.schema([("n_directed", pa.int64()), ("n_recip", pa.int64())])

    def per_part(part: pa.Table) -> pa.Table:
        if "part" in part.column_names:
            part = part.drop_columns(["part"])
        if part.num_rows == 0:
            return cnt_schema.empty_table()
        g = part.group_by(["a", "b"]).aggregate([("fwd", "max"), ("rev", "max")])
        fwd = g.column("fwd_max").to_numpy(zero_copy_only=False).astype(np.int64)
        rev = g.column("rev_max").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_directed": pa.array([int((fwd + rev).sum())], pa.int64()),
                "n_recip": pa.array([2 * int((fwd & rev).sum())], pa.int64()),
            }
        )

    folded = (
        hash_partitioned_groups(
            adjacency.map_batches(partial, batch_format="pyarrow"),
            ["a", "b"],
            per_part,
            n_parts,
        ).aggregate(
            Sum("n_directed", alias_name="n_directed"),
            Sum("n_recip", alias_name="n_recip"),
        )
        or {}
    )
    d = int(folded.get("n_directed") or 0)
    r = int(folded.get("n_recip") or 0)
    milli = (2000 * r + d) // (2 * d) if d > 0 else 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_directed": pa.array([d], pa.int64()),
                "n_reciprocated": pa.array([r], pa.int64()),
                "reciprocity_milli": pa.array([milli], pa.int64()),
            }
        )
    )


def harmonic_centrality(
    adjacency: ray.data.Dataset, seed_pct: int = 5, max_hops: int = 4
) -> ray.data.Dataset:
    """Landmark-approximated harmonic centrality over the undirected
    simple KG entity graph: every md5-bucket landmark runs a BFS and
    each node scores ``Σ_landmarks 1/dist`` (self excluded, unreached
    landmarks contribute 0 — harmonic centrality's defining advantage
    over closeness on disconnected graphs).  Per-term integer rounding
    ``(2·10⁶ + d) // (2d)`` makes the sum order-free and the SQL replay
    value-exact.  Output: (node, n_reached, h_micro) for every node that
    reaches ≥ 1 landmark within ``max_hops``.

    Scale shape: the bfs_hops machinery lifted to the composite
    (node, seed) key — pinned mirrored-edge partitions, per round ONE
    dist exchange through the edge hash; the per-partition probe is a
    sorted searchsorted-range + prefix-sum gather (one edge row fans out
    to its u's seed rows, the band-join kernel) with a local
    (node, seed) min combine before the keyed fold.  Relaxation stays
    monotone, so the fixed round count is partition-independent and the
    SQL unroll compares exactly.  Frontier volume is bounded by
    nodes × landmarks — seed_pct directly prices the accuracy/cost
    trade, which is the point of landmark approximation."""
    from ray.data.aggregate import Min, Sum

    n_parts = derive_n_parts(adjacency.count(), rows_per_part=65536)
    edges = _undirected_both_dirs(adjacency, n_parts)

    # Small-graph planner (round 5): local joint multi-landmark BFS over
    # a [V, S] distance matrix — identical per-term integer rounding and
    # round count (tests); guarded by V·S cells as well as bytes.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.string()),
                        "n_reached": pa.array([], pa.int64()),
                        "h_micro": pa.array([], pa.int64()),
                    }
                )
            )
        et = pa.concat_tables(tabs)
        u = et.column("u").to_numpy(zero_copy_only=False)
        v = et.column("v").to_numpy(zero_copy_only=False)
        node_arr = np.unique(u)
        seed_mask = bfs_seed_mask(pa.array(node_arr), seed_pct).to_numpy(
            zero_copy_only=False
        )
        S = int(seed_mask.sum())
        if S == 0 or len(node_arr) * S <= 50_000_000:
            ui = np.searchsorted(node_arr, u)
            vi = np.searchsorted(node_arr, v)
            INF = np.iinfo(np.int64).max
            D = np.full((len(node_arr), max(S, 1)), INF, np.int64)
            seed_idx = np.flatnonzero(seed_mask)
            D[seed_idx, np.arange(S)] = 0
            for _ in range(max_hops):
                du = D[ui, :].copy()
                fin = du != INF
                du[fin] += 1  # masked bump — INF+1 would wrap
                cand = np.full_like(D, INF)
                np.minimum.at(cand, vi, du)
                D = np.minimum(D, cand)
            good = (D > 0) & (D != INF)
            n_reached = good.sum(axis=1).astype(np.int64)
            dd = np.where(good, D, 1)
            h = np.where(good, (2_000_000 + dd) // (2 * dd), 0).sum(axis=1).astype(np.int64)
            keep = n_reached > 0
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(node_arr[keep]),
                        "n_reached": pa.array(n_reached[keep], pa.int64()),
                        "h_micro": pa.array(h[keep], pa.int64()),
                    }
                )
            ).sort("node")

    def seed_partial(part: pa.Table) -> pa.Table:
        nodes = pc.unique(part.column("u").combine_chunks())
        picked = nodes.filter(bfs_seed_mask(nodes, seed_pct))
        return pa.table(
            {
                "node": picked,
                "seed": picked,
                "dist": pa.array(np.zeros(len(picked), np.int64)),
            }
        )

    dist = (
        edges.groupby("part")
        .map_groups(seed_partial, batch_format="pyarrow")
        .materialize()
    )

    cand_schema = pa.schema(
        [("node", pa.string()), ("seed", pa.string()), ("dist", pa.int64())]
    )

    def dist_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": batch.column("node"),
                "v": batch.column("node"),
                "seed": batch.column("seed"),
                "dist": batch.column("dist").cast(pa.int64()),
            }
        )
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def edge_tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["u", "v"])
        t = t.append_column("seed", pa.nulls(t.num_rows, pa.string()))
        t = t.append_column("dist", pa.array(np.full(t.num_rows, -1, np.int64)))
        return t.append_column("part", part_array(t, ["u"], n_parts))

    def probe(part: pa.Table) -> pa.Table:
        d = part.column("dist").to_numpy(zero_copy_only=False)
        is_dist = d >= 0
        if not is_dist.any() or is_dist.all():
            return cand_schema.empty_table()
        u = part.column("u").to_numpy(zero_copy_only=False).astype(str)
        dn = u[is_dist]
        ds = part.column("seed").to_numpy(zero_copy_only=False)[is_dist].astype(str)
        dv = d[is_dist]
        order = np.argsort(dn, kind="mergesort")
        dn, ds, dv = dn[order], ds[order], dv[order]
        eu = u[~is_dist]
        ev = part.column("v").to_numpy(zero_copy_only=False)[~is_dist].astype(str)
        lo = np.searchsorted(dn, eu, "left")
        hi = np.searchsorted(dn, eu, "right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot == 0:
            return cand_schema.empty_table()
        base = np.repeat(lo, cnt)
        within = np.arange(tot) - np.repeat(np.r_[np.int64(0), np.cumsum(cnt)[:-1]], cnt)
        src = base + within
        t = pa.table(
            {
                "node": pa.array(np.repeat(ev, cnt), pa.string()),
                "seed": pa.array(ds[src], pa.string()),
                "dist": pa.array(dv[src] + 1, pa.int64()),
            }
        )
        return (
            t.group_by(["node", "seed"])
            .aggregate([("dist", "min")])
            .rename_columns(["node", "seed", "dist"])
        )

    for _ in range(max_hops):
        tagged = edges.map_batches(edge_tag, batch_format="pyarrow").union(
            dist.map_batches(dist_tag, batch_format="pyarrow")
        )
        cand = tagged.groupby("part").map_groups(probe, batch_format="pyarrow")

        def cand_norm(batch: pa.Table) -> pa.Table:
            return batch.select(["node", "seed", "dist"])

        dist = (
            dist.map_batches(cand_norm, batch_format="pyarrow")
            .union(cand.map_batches(cand_norm, batch_format="pyarrow"))
            .groupby(["node", "seed"])
            .aggregate(Min("dist", alias_name="dist"))
            .repartition(n_parts)
            .materialize()
        )

    def hpartial(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        keep = d > 0
        node = batch.column("node").filter(pa.array(keep))
        dd = d[keep]
        h = (2_000_000 + dd) // (2 * dd)
        t = pa.table(
            {
                "node": node,
                "n_reached": pa.array(np.ones(len(dd), np.int64)),
                "h_micro": pa.array(h.astype(np.int64), pa.int64()),
            }
        )
        g = t.group_by("node").aggregate([("n_reached", "sum"), ("h_micro", "sum")])
        return g.rename_columns(["node", "n_reached", "h_micro"])

    return (
        dist.map_batches(hpartial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(
            Sum("n_reached", alias_name="n_reached"),
            Sum("h_micro", alias_name="h_micro"),
        )
        .sort("node")
    )


def ktruss(adjacency: ray.data.Dataset, k: int = 3, max_rounds: int = 5) -> ray.data.Dataset:
    """``k``-truss of the undirected simple KG entity graph: the maximal
    subgraph where EVERY edge sits in ≥ k−2 triangles *of the subgraph*
    — the cohesion filter that keeps tightly-corroborated relation
    clusters and sheds spurious one-off links (strictly stronger than
    k-core).  Synchronized peeling: each round recomputes per-edge
    triangle support over the SURVIVING edges (reusing
    :func:`edge_jaccard`'s degree-ordered wedge machinery wholesale)
    and drops every under-supported edge at once; support is monotone
    non-increasing under edge removal, so the fixpoint is exact and
    rounds past it are no-ops — which lets a fixed-depth SQL unroll
    compare exactly (the kcore discipline).  Output: surviving
    (node_a, node_b, support) edges.

    Scale shape per round: exactly edge_jaccard's exchanges (out-degree
    bounded O(√m) wedge keys, co-partitioned credit/degree attach,
    nothing graph-sized on the driver) plus one streaming filter; the
    early-exit count check is a safe optimization because post-fixpoint
    rounds cannot change the edge set at any partitioning."""
    n_parts = derive_n_parts(adjacency.count(), rows_per_part=65536)
    surviving = adjacency
    prev_n = -1
    ej = None
    for _ in range(max_rounds):
        # repartition BEFORE materializing: edge_jaccard's exchanges emit
        # blocks ∝ input blocks, so an unbounded loop compounds block
        # count ~9× per round (measured 27 → 243 → …; the BASELINE.md
        # iterative-loop gotcha) and round wall-time with it
        ej = edge_jaccard(surviving).repartition(n_parts).materialize()
        kept = ej.filter(expr=f"n_common >= {k - 2}").materialize()
        n = kept.count()

        def to_adj(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src_id": batch.column("node_a"),
                    "dst_id": batch.column("node_b"),
                }
            )

        surviving = kept.map_batches(to_adj, batch_format="pyarrow")
        if n == prev_n:  # fixpoint: further rounds are no-ops
            break
        prev_n = n

    # support reported over the FINAL edge set (no further filter —
    # exactly max_rounds peel rounds, matching the SQL unroll depth;
    # post-fixpoint early exit is a no-op so the sets agree)
    final = edge_jaccard(surviving)

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_a": batch.column("node_a"),
                "node_b": batch.column("node_b"),
                "support": batch.column("n_common").cast(pa.int64()),
            }
        )

    return final.map_batches(out, batch_format="pyarrow").sort(["node_a", "node_b"])


def power_law_alpha(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Power-law exponent MLE of the KG degree distribution (the
    Clauset-Shalizi-Newman continuous approximation at d_min = 1:
    α = 1 + n / Σ_d c_d·ln(2d)) — the one-number hub-heaviness summary
    that decides whether skew salting is worth wiring for a corpus.
    Exact cross-engine despite the logarithm: every ln term rounds to
    integer nano BEFORE the sum (the corpus-drift per-term-rounding
    precedent — libm doubles agree, sum order no longer matters), and
    the final α is pure integer arithmetic:
    ``alpha_nano = 1e9 + (2·n·10¹⁸ + S) // (2·S)``.  Output one row:
    (n_nodes, max_deg, alpha_nano).

    Scale shape: rides :func:`degree_histogram` (two combine-fed
    exchanges, output ≤ max-degree rows); the driver folds only the
    histogram."""
    rows = degree_histogram(adjacency).take_all()  # ≤ max-degree rows
    n = sum(int(r["n_nodes"]) for r in rows)
    max_deg = max((int(r["deg"]) for r in rows), default=0)
    s_nano = sum(
        int(r["n_nodes"]) * int(np.floor(np.log(2.0 * float(r["deg"])) * 1e9 + 0.5))
        for r in rows
        if int(r["deg"]) >= 1
    )
    if s_nano > 0:
        alpha_nano = 1_000_000_000 + (2 * n * 10**18 + s_nano) // (2 * s_nano)
    else:
        alpha_nano = 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_nodes": pa.array([n], pa.int64()),
                "max_deg": pa.array([max_deg], pa.int64()),
                "alpha_nano": pa.array([alpha_nano], pa.int64()),
            }
        )
    )


def predicate_cardinality(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Per-predicate cardinality profile of the KG — edge count, exact
    distinct subjects/objects and the PARIS-style functionality /
    inverse-functionality in integer milli (func = n_src/n_edges: 1000
    means each subject asserts the relation once — a good key; low
    means hub subjects).  The KB-quality screen that decides which
    predicates are safe join keys for entity resolution.

    Scale shape: edge counts ride one combine-fed pred fold (≤ |preds|
    rows per batch); distinct endpoint counts ride the standard
    distinct-pair exchange — per-batch DISTINCT (pred, role, id) rows
    bound the shuffle at distinct-per-batch, the groupby dedups
    globally, and a second combine-fed fold counts per (pred, role).
    The driver merges ≤ |preds| rows from two folds."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("pred").combine_chunks())
        return pa.table(
            {
                "pred": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    edge_counts = (
        adjacency.map_batches(count_partial, batch_format="pyarrow")
        .groupby("pred")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # ≤ |preds| rows

    def endpoint_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("pred")
        parts = []
        for role, col in (("s", "src_id"), ("o", "dst_id")):
            t = pa.table(
                {"pred": p, "role": pa.array([role] * batch.num_rows), "id": batch.column(col)}
            )
            parts.append(t.group_by(["pred", "role", "id"]).aggregate([]))
        return pa.concat_tables(parts)

    def pair_count_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["pred", "role"]).group_by(["pred", "role"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "pred": t.column("pred"),
                "role": t.column("role"),
                "n": t.column("count_all").cast(pa.int64()),
            }
        )

    distinct_counts = (
        adjacency.map_batches(endpoint_partial, batch_format="pyarrow")
        .groupby(["pred", "role", "id"])
        .count()
        .map_batches(pair_count_partial, batch_format="pyarrow")
        .groupby(["pred", "role"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # ≤ 2·|preds| rows
    n_src = {r["pred"]: int(r["n"]) for r in distinct_counts if r["role"] == "s"}
    n_dst = {r["pred"]: int(r["n"]) for r in distinct_counts if r["role"] == "o"}
    preds = sorted(r["pred"] for r in edge_counts)
    ne = {r["pred"]: int(r["n"]) for r in edge_counts}
    return ray.data.from_arrow(
        pa.table(
            {
                "pred": pa.array(preds, pa.string()),
                "n_edges": pa.array([ne[p] for p in preds], pa.int64()),
                "n_src": pa.array([n_src.get(p, 0) for p in preds], pa.int64()),
                "n_dst": pa.array([n_dst.get(p, 0) for p in preds], pa.int64()),
                "func_milli": pa.array(
                    [(2000 * n_src.get(p, 0) + ne[p]) // (2 * ne[p]) for p in preds],
                    pa.int64(),
                ),
                "inv_func_milli": pa.array(
                    [(2000 * n_dst.get(p, 0) + ne[p]) // (2 * ne[p]) for p in preds],
                    pa.int64(),
                ),
            }
        )
    )


def component_size_hist(adjacency: ray.data.Dataset) -> ray.data.Dataset:
    """Connected-component size histogram of the KG entity graph (the
    fragmentation diagnostic: one giant component means the corpus
    cross-links; thousands of small ones mean isolated fact islands —
    and the giant-component size bounds any per-component algorithm's
    worst partition).  Components over the deduped undirected simple
    edge set; singleton (edge-free) entities are deliberately excluded
    (output stays O(|edges|), the connected_components contract).
    Output per size: (size, n_components), ascending.

    Scale shape: per-batch canonical-edge Arrow dedup partials, the
    engine's adaptive-pointer-jumping :func:`..components.connected_components`
    (O(log n) rounds, broadcast labels below a byte bound, keyed
    exchanges above), then a combine-fed (size → node count) fold whose
    output is bounded by distinct sizes; the driver divides node counts
    by size — n_components·size == n_nodes is asserted."""
    from ray.data.aggregate import Sum

    from .components import connected_components

    def hex16_to_i64(ids: np.ndarray) -> np.ndarray:
        """'e_<16 lowercase hex>' → order-preserving int64 (uint64 value
        xor-shifted by 2⁶³): fixed-width lowercase hex is monotone with
        its numeric value, so integer min == lexicographic min — the CC
        needs integer labels (alias_clusters precedent).  Vectorized: a
        16-step nibble fold over the ASCII byte matrix, no per-row
        parse."""
        raw = np.asarray(ids, dtype="U18").view(np.uint32).reshape(-1, 18)[:, 2:]
        nib = raw - 48 - 39 * (raw >= 97)
        acc = np.zeros(len(raw), np.uint64)
        for i in range(16):
            acc = acc * np.uint64(16) + nib[:, i].astype(np.uint64)
        return (acc ^ np.uint64(1 << 63)).view(np.int64)

    def edge_partial(batch: pa.Table) -> pa.Table:
        s = batch.column("src_id").to_numpy(zero_copy_only=False)
        d = batch.column("dst_id").to_numpy(zero_copy_only=False)
        keep = s != d
        si = hex16_to_i64(s[keep])
        di = hex16_to_i64(d[keep])
        a = np.minimum(si, di)
        b = np.maximum(si, di)
        t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
        return t.group_by(["a", "b"]).aggregate([])

    pairs = adjacency.map_batches(edge_partial, batch_format="pyarrow")
    comp = connected_components(pairs, id_a="a", id_b="b")

    def size_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("cluster_size").combine_chunks())
        return pa.table(
            {
                "size": vc.field("values").cast(pa.int64()),
                "n_nodes": vc.field("counts").cast(pa.int64()),
            }
        )

    hist = (
        comp.map_batches(size_partial, batch_format="pyarrow")
        .groupby("size")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
        .take_all()
    )  # ≤ distinct sizes
    sizes = sorted(int(r["size"]) for r in hist)
    nn = {int(r["size"]): int(r["n_nodes"]) for r in hist}
    for s in sizes:
        if nn[s] % s != 0:
            raise AssertionError(f"component bookkeeping broken at size {s}")
    return ray.data.from_arrow(
        pa.table(
            {
                "size": pa.array(sizes, pa.int64()),
                "n_components": pa.array([nn[s] // s for s in sizes], pa.int64()),
            }
        )
    )


def hits(
    adjacency: ray.data.Dataset,
    iters: int = 3,
    pin_bytes_bound: int = PIN_EDGES_BYTES_BOUND,
) -> ray.data.Dataset:
    """HITS hubs & authorities (Kleinberg) over the DIRECTED distinct
    edge set of the adjacency table — the link-analysis dual of
    PageRank: a good hub points at good authorities, a good authority
    is pointed at by good hubs.  Mutual recursion ``a(v) = Σ_{u→v} h(u)``
    / ``h(u) = Σ_{u→v} a(v)`` run ``iters`` rounds, with the usual
    normalization replaced by an integer rescale to 10⁶ at the MAX
    score after every half-step (floats never appear, so the SQL unroll
    replays bit-exactly; envelope: max in/out-degree × 10¹² must fit
    int64 — degree ≤ 9·10⁶, far past the KG's hubs).

    Scale shape: distinct directed edges are MIRRORED once — a u-keyed
    row for the hub→authority probe and a v-keyed row for the
    authority→hub probe — and both exchanges are hash-partitioned by
    that key with cross-batch dedup reduce-side (the pagerank
    ``_collapsed_edges`` prep shape); each half-step unions the current
    score rows into the matching partition, probes with one vectorized
    searchsorted, pre-sums contributions per destination INSIDE the
    partition, and folds one global max (a scalar) for the rescale.
    Below the pagerank pinning byte bound the mirrored edge partitions
    are ray.put ONCE and fetched zero-copy in the probe, so the
    per-half-step exchange carries only score rows; above it (or with
    ``pin_bytes_bound=0``) iterations re-union the edge dataset —
    bit-equality of the two paths is tested."""
    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)
    SCALE6 = 10**6

    def mirror(batch: pa.Table) -> pa.Table:
        t = (
            pa.table({"u": batch.column("src_id"), "v": batch.column("dst_id")})
            .group_by(["u", "v"])
            .aggregate([])
        )
        fwd = pa.table({"key": t.column("u"), "other": t.column("v")})
        bwd = pa.table({"key": t.column("v"), "other": t.column("u")})
        fwd = fwd.append_column("dir", pa.array(np.zeros(t.num_rows, np.int8)))
        bwd = bwd.append_column("dir", pa.array(np.ones(t.num_rows, np.int8)))
        out = pa.concat_tables([fwd, bwd])
        return out.append_column("part", part_array(out, ["key"], n_parts))

    edge_prep_schema = pa.schema(
        [("key", pa.string()), ("other", pa.string()), ("dir", pa.int8()),
         ("part", pa.int32())]
    )

    def prep_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return edge_prep_schema.empty_table()
        t = part.group_by(["key", "other", "dir"]).aggregate([])
        pid = part.column("part")[0].as_py()
        t = t.sort_by([("dir", "ascending"), ("key", "ascending"), ("other", "ascending")])
        return t.append_column(
            "part", pa.array(np.full(t.num_rows, pid, np.int32))
        )

    edges = (
        adjacency.map_batches(mirror, batch_format="pyarrow")
        .groupby("part")
        .map_groups(prep_part, batch_format="pyarrow")
        .materialize()
    )

    # Small-graph planner (round 5, the pagerank convention): below
    # LOCAL_GRAPH_BYTES_BOUND the whole mirrored edge table is gathered
    # once and the exact-integer half-steps run in numpy with no
    # per-half-step exchange — bit-identical (integer sums + max-rescale
    # only; asserted in tests), and each of the 2·iters all-to-alls costs
    # seconds of fixed latency (3-iteration HITS on the 625-edge KG
    # measured 108 s distributed).  Above the bound: unchanged exchanges.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        fwd = pa.concat_tables(
            [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        ) if n_edges else None
        if fwd is None or fwd.num_rows == 0:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.string()),
                        "hub_scaled": pa.array([], pa.int64()),
                        "auth_scaled": pa.array([], pa.int64()),
                    }
                )
            )
        f = fwd.filter(pc.equal(fwd.column("dir"), 0))
        eu = f.column("key").to_numpy(zero_copy_only=False)
        ev = f.column("other").to_numpy(zero_copy_only=False)
        node_arr = np.unique(np.concatenate([eu, ev]))
        ui = np.searchsorted(node_arr, eu)
        vi = np.searchsorted(node_arr, ev)

        def _half(score: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
            raw = np.zeros(len(node_arr), np.int64)
            np.add.at(raw, dst, score[src])
            m = int(raw.max()) if len(raw) else 0
            return raw * SCALE6 // m if m > 0 else np.zeros(len(node_arr), np.int64)

        hub = np.full(len(node_arr), SCALE6, np.int64)
        auth = np.zeros(len(node_arr), np.int64)
        for _ in range(iters):
            auth = _half(hub, ui, vi)
            hub = _half(auth, vi, ui)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_arr),
                    "hub_scaled": pa.array(hub, pa.int64()),
                    "auth_scaled": pa.array(auth, pa.int64()),
                }
            )
        ).sort("node")

    # Pin the static side (the pagerank convention, same byte bound):
    # below the bound each mirrored edge partition is ray.put ONCE and
    # fetched zero-copy inside the probe, so per-half-step exchanges
    # carry only score rows; above it, iterations re-union the edge
    # dataset (bit-equal by construction, correct at any size).
    edge_refs: dict[int, "ray.ObjectRef"] | None = None
    if edges.size_bytes() <= pin_bytes_bound:
        bufs: dict[int, list[pa.Table]] = {}
        for b in edges.iter_batches(batch_format="pyarrow"):
            for pid in pc.unique(b.column("part")).to_pylist():
                bufs.setdefault(pid, []).append(
                    b.filter(pc.equal(b.column("part"), pid))
                )
        edge_refs = {}
        for pid, tabs in bufs.items():
            t = pa.concat_tables(tabs).sort_by(
                [("dir", "ascending"), ("key", "ascending"), ("other", "ascending")]
            )
            edge_refs[pid] = ray.put(t.select(["key", "other", "dir"]))
        del bufs

    def node_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(batch.column("key").combine_chunks())})

    nodes = (
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node")
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "contrib": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )

    zeros = nodes.map_batches(zero_rows, batch_format="pyarrow").materialize()

    def init_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "s": pa.array(np.full(batch.num_rows, SCALE6, np.int64)),
            }
        )

    def half_step(scores: ray.data.Dataset, direction: int) -> ray.data.Dataset:
        """direction 0: auth(other) += score(key=u) over fwd edge rows;
        direction 1: hub(other) += score(key=v) over bwd edge rows."""

        def score_side(batch: pa.Table) -> pa.Table:
            t = pa.table({"key": batch.column("node"), "s": batch.column("s")})
            t = t.append_column("part", part_array(t, ["key"], n_parts))
            return pa.table(
                {
                    "key": t.column("key"),
                    "other": pa.array([None] * t.num_rows, pa.string()),
                    "dir": pa.array(np.full(t.num_rows, -1, np.int8)),
                    "s": t.column("s"),
                    "part": t.column("part"),
                }
            )

        def edge_side(batch: pa.Table) -> pa.Table:
            keep = pc.equal(batch.column("dir"), direction)
            t = batch.filter(keep)
            return pa.table(
                {
                    "key": t.column("key"),
                    "other": t.column("other"),
                    "dir": t.column("dir"),
                    "s": pa.array(np.zeros(t.num_rows, np.int64)),
                    "part": t.column("part"),
                }
            )

        contrib_schema = pa.schema([("node", pa.string()), ("contrib", pa.int64())])

        def probe(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return contrib_schema.empty_table()
            d = part.column("dir").to_numpy(zero_copy_only=False)
            is_edge = d >= 0
            if not is_edge.any() or is_edge.all():
                return contrib_schema.empty_table()
            k = part.column("key").to_numpy(zero_copy_only=False)
            sk, sv = k[~is_edge], part.column("s").to_numpy(zero_copy_only=False)[~is_edge]
            order = np.argsort(sk, kind="mergesort")
            sk, sv = sk[order], sv[order]
            ek = k[is_edge]
            pos = np.searchsorted(sk, ek)
            contrib = sv[pos]
            return (
                pa.table(
                    {
                        "node": part.column("other").filter(pa.array(is_edge)),
                        "contrib": pa.array(contrib, pa.int64()),
                    }
                )
                .group_by(["node"])
                .aggregate([("contrib", "sum")])
                .rename_columns(["node", "contrib"])
            )

        def probe_pinned(part: pa.Table) -> pa.Table:
            """Score-rows-only partition; this partition's pinned edges
            fetched zero-copy and filtered to the needed direction."""
            if part.num_rows == 0:
                return contrib_schema.empty_table()
            ref = edge_refs.get(part.column("part")[0].as_py())
            if ref is None:
                return contrib_schema.empty_table()
            et = ray.get(ref)
            et = et.filter(pc.equal(et.column("dir"), direction))
            if et.num_rows == 0:
                return contrib_schema.empty_table()
            sk = part.column("key").to_numpy(zero_copy_only=False)
            sv = part.column("s").to_numpy(zero_copy_only=False)
            order = np.argsort(sk, kind="mergesort")
            sk, sv = sk[order], sv[order]
            ek = et.column("key").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(sk, ek)
            return (
                pa.table(
                    {
                        "node": et.column("other"),
                        "contrib": pa.array(sv[pos], pa.int64()),
                    }
                )
                .group_by(["node"])
                .aggregate([("contrib", "sum")])
                .rename_columns(["node", "contrib"])
            )

        if edge_refs is not None:
            tagged = scores.map_batches(score_side, batch_format="pyarrow")
            grouped = tagged.groupby("part").map_groups(
                probe_pinned, batch_format="pyarrow"
            )
        else:
            unioned = scores.map_batches(score_side, batch_format="pyarrow").union(
                edges.map_batches(edge_side, batch_format="pyarrow")
            )
            grouped = unioned.groupby("part").map_groups(probe, batch_format="pyarrow")
        raw = (
            grouped
            .union(zeros)
            .groupby("node")
            .sum("contrib")
            .map_batches(
                lambda t: t.rename_columns(["node", "contrib"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        m = raw.max("contrib")
        m = int(m) if m is not None else 0

        def rescale(batch: pa.Table) -> pa.Table:
            c = batch.column("contrib").to_numpy(zero_copy_only=False)
            s = (c * SCALE6 // m) if m > 0 else np.zeros(len(c), np.int64)
            return pa.table({"node": batch.column("node"), "s": pa.array(s, pa.int64())})

        return raw.map_batches(rescale, batch_format="pyarrow")

    hubs = nodes.map_batches(init_scores, batch_format="pyarrow")
    auths = None
    for _ in range(iters):
        auths = half_step(hubs, 0)
        hubs = half_step(auths, 1)

    def side(col: str):
        def f(batch: pa.Table) -> pa.Table:
            z = np.zeros(batch.num_rows, np.int64)
            s_ = batch.column("s").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": batch.column("node"),
                    "hub_scaled": pa.array(s_ if col == "hub" else z, pa.int64()),
                    "auth_scaled": pa.array(s_ if col == "auth" else z, pa.int64()),
                }
            )

        return f

    # every node appears exactly once per side — a sum-merge joins them
    return (
        hubs.map_batches(side("hub"), batch_format="pyarrow")
        .union(auths.map_batches(side("auth"), batch_format="pyarrow"))
        .groupby("node")
        .sum(["hub_scaled", "auth_scaled"])
        .map_batches(
            lambda t: t.rename_columns(["node", "hub_scaled", "auth_scaled"]),
            batch_format="pyarrow",
        )
        .sort("node")
    )


def trim_core(adjacency: ray.data.Dataset, max_rounds: int = 32) -> ray.data.Dataset:
    """Directed trim core — iterated source/sink peeling (each round
    simultaneously removes every node with zero in-degree OR zero
    out-degree in the surviving subgraph), the classic pre-pass of SCC
    decomposition and the standard DAG test: the graph is acyclic iff
    the core empties.  Self-loops count both ways, so a self-looped
    node always survives.  Rounds cap at ``max_rounds`` (both engines
    run ≤ cap with early exit, so the unrolled SQL replay is exact even
    when a longer chain hasn't fully peeled).  Output one row per
    executed round: (round, removed, core_after) — core_after of the
    last row is the cycle-core size, 0 ⇔ DAG (within the cap).

    Scale shape (the kcore/ktruss peel class): the distinct directed
    edge set re-derives per round from the survivor set; each round is
    two combine-fed degree groupbys plus one survivor semi-join —
    exchange volume ∝ surviving edges, monotonically shrinking."""
    import pyarrow.compute as pc

    def edge_partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table({"u": batch.column("src_id"), "v": batch.column("dst_id")})
            .group_by(["u", "v"])
            .aggregate([])
        )

    edges = (
        adjacency.map_batches(edge_partial, batch_format="pyarrow")
        .groupby(["u", "v"])
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    # Small-graph planner (round 5): local source/sink peeling with the
    # identical round ledger (tests); unchanged above the bound.
    if edges.size_bytes() <= LOCAL_GRAPH_BYTES_BOUND:
        tabs = [b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows]
        ou_r, ou_rm, ou_c = [], [], []
        if tabs:
            et = pa.concat_tables(tabs)
            u = et.column("u").to_numpy(zero_copy_only=False)
            v = et.column("v").to_numpy(zero_copy_only=False)
            node_arr = np.unique(np.concatenate([u, v]))
            ui = np.searchsorted(node_arr, u)
            vi = np.searchsorted(node_arr, v)
            alive_e = np.ones(len(ui), bool)
            prev = len(node_arr)
            for rnd in range(1, max_rounds + 1):
                outs = np.zeros(len(node_arr), np.int64)
                ins = np.zeros(len(node_arr), np.int64)
                np.add.at(outs, ui[alive_e], 1)
                np.add.at(ins, vi[alive_e], 1)
                surv = (outs > 0) & (ins > 0)
                n_surv = int(surv.sum())
                removed = prev - n_surv
                ou_r.append(rnd)
                ou_rm.append(removed)
                ou_c.append(n_surv)
                if removed == 0 or n_surv == 0:
                    break
                prev = n_surv
                alive_e &= surv[ui] & surv[vi]
        return ray.data.from_arrow(
            pa.table(
                {
                    "round": pa.array(ou_r, pa.int64()),
                    "removed": pa.array(ou_rm, pa.int64()),
                    "core_after": pa.array(ou_c, pa.int64()),
                }
            )
        )
    out_rounds, out_removed, out_core = [], [], []
    n_nodes = None
    for rnd in range(1, max_rounds + 1):
        def deg_partial(batch: pa.Table) -> pa.Table:
            outs = pa.table({"node": batch.column("u")}).append_column(
                "side", pa.array(np.zeros(batch.num_rows, np.int8))
            )
            ins = pa.table({"node": batch.column("v")}).append_column(
                "side", pa.array(np.ones(batch.num_rows, np.int8))
            )
            return pa.concat_tables([outs, ins]).group_by(["node", "side"]).aggregate([])

        # survivors = nodes with BOTH an out-edge and an in-edge
        def keep_both(part: pa.Table) -> pa.Table:
            g = part.group_by(["node"]).aggregate([("side", "count_distinct")])
            return pa.table(
                {"node": g.column("node").filter(pc.equal(g.column("side_count_distinct"), 2))}
            )

        survivors = (
            edges.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("node")
            .map_groups(keep_both, batch_format="pyarrow")
            .materialize()
        )
        n_surv = survivors.count()
        if n_nodes is None:
            # initial node count from the round-1 degree rows
            def node_partial(batch: pa.Table) -> pa.Table:
                both = pa.concat_arrays(
                    [batch.column("u").combine_chunks(), batch.column("v").combine_chunks()]
                )
                return pa.table({"node": pc.unique(both)})

            n_nodes = (
                edges.map_batches(node_partial, batch_format="pyarrow")
                .groupby("node")
                .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
                .count()
            )
            prev = n_nodes
        removed = prev - n_surv
        out_rounds.append(rnd)
        out_removed.append(removed)
        out_core.append(n_surv)
        if removed == 0 or n_surv == 0:
            break
        prev = n_surv
        # survivor semi-join: the shrinking node set is concatenated on
        # the driver and broadcast once per round (ray.put, zero-copy
        # reads), applied with one vectorized is_in per batch.  This
        # broadcast is UNCONDITIONAL — driver memory is bounded by the
        # node universe (ids only, ~16 B/node: 10⁸ entities ≈ 1.6 GB),
        # fine for a KG entity set but not for an arbitrary web-scale
        # graph.  A reduce-side fallback exists in the codebase as the
        # tagged-union hash-partitioned anti-join of
        # functions/components.dedup_keep_one (same shape, inverted
        # mask); wiring it here would cost two keyed exchanges of the
        # edge table PER ROUND, which is why it is not the default.
        surv_arr = pa.concat_arrays(
            [
                b.column("node").combine_chunks()
                for b in survivors.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
        )
        surv_ref = ray.put(surv_arr)

        def filter_edges(batch: pa.Table) -> pa.Table:
            ss = ray.get(surv_ref)
            keep = pc.and_(
                pc.is_in(batch.column("u").combine_chunks(), value_set=ss),
                pc.is_in(batch.column("v").combine_chunks(), value_set=ss),
            )
            return batch.filter(keep)

        edges = edges.map_batches(filter_edges, batch_format="pyarrow").materialize()
    return ray.data.from_arrow(
        pa.table(
            {
                "round": pa.array(out_rounds, pa.int64()),
                "removed": pa.array(out_removed, pa.int64()),
                "core_after": pa.array(out_core, pa.int64()),
            }
        )
    )


def diameter_2sweep(
    adjacency: ray.data.Dataset, max_hops: int = 12
) -> ray.data.Dataset:
    """Double-sweep diameter lower bound of the undirected KG graph —
    the standard cheap estimator (Magnien/Latapy/Habib): BFS from a
    deterministic start (the lexicographically smallest node), take the
    farthest node reached, BFS again from there; the second
    eccentricity lower-bounds the diameter and is exact on trees.
    Both sweeps cap at ``max_hops`` rounds (identically in the SQL
    unroll, so a deeper graph degrades both engines the same way);
    farthest-node ties break lexicographically.  Output one row:
    (src, ecc_src, far_node, diameter_lb, far_node_2).

    Scale shape: two :func:`bfs_hops` runs (pinned static edge
    partitions, score-rows-only per-round exchange) plus two max/min
    aggregates over the nodes-sized distance table — nothing beyond the
    BFS discipline."""
    from ray.data.aggregate import Min

    def min_node_partial(batch: pa.Table) -> pa.Table:
        # node universe = endpoints of non-self edges (the BFS mirror
        # drops self-loops, and the SQL replay's node set must agree)
        keep = pc.invert(pc.equal(batch.column("src_id"), batch.column("dst_id")))
        t = batch.filter(keep)
        both = pa.concat_arrays(
            [t.column("src_id").combine_chunks(), t.column("dst_id").combine_chunks()]
        )
        m = pc.min(both).as_py()
        return pa.table({"node": pa.array([m] if m is not None else [], pa.string())})

    schema = pa.schema(
        [
            ("src", pa.string()),
            ("ecc_src", pa.int64()),
            ("far_node", pa.string()),
            ("diameter_lb", pa.int64()),
            ("far_node_2", pa.string()),
        ]
    )
    agg = adjacency.map_batches(min_node_partial, batch_format="pyarrow").aggregate(
        Min("node", alias_name="m")
    )
    if not agg or agg.get("m") is None:
        return ray.data.from_arrow(schema.empty_table())
    src = str(agg["m"])

    def far_of(dist: ray.data.Dataset) -> tuple[str, int]:
        d = dist.materialize()
        mx = d.max("dist")
        mx = int(mx) if mx is not None else 0
        far = d.filter(expr=f"dist == {mx}").aggregate(Min("node", alias_name="m"))
        return str(far["m"]), mx

    d1 = bfs_hops(adjacency, max_hops=max_hops, seeds=[src])
    far_a, ecc = far_of(d1)
    d2 = bfs_hops(adjacency, max_hops=max_hops, seeds=[far_a])
    far_b, diam = far_of(d2)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([src], pa.string()),
                "ecc_src": pa.array([ecc], pa.int64()),
                "far_node": pa.array([far_a], pa.string()),
                "diameter_lb": pa.array([diam], pa.int64()),
                "far_node_2": pa.array([far_b], pa.string()),
            }
        )
    )
