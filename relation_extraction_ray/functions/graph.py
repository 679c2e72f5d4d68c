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


def pagerank(
    adjacency: ray.data.Dataset, iters: int = 5, damping_pct: int = 85
) -> ray.data.Dataset:
    """Integer PageRank over the adjacency table: returns (node, rank)
    with rank in 1e-12 units, sorted by (rank desc, node asc)."""
    n_edges = adjacency.count()
    n_parts = derive_n_parts(n_edges, rows_per_part=65536)
    edges = _collapsed_edges(adjacency, n_parts)

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
        return pa.table(
            {
                "node": batch.column("node"),
                "rank": pa.array(np.full(batch.num_rows, SCALE, np.int64)),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow")

    def tag_ranks(batch: pa.Table) -> pa.Table:
        t = pa.table({"u": batch.column("node"), "rank": batch.column("rank")})
        return t.append_column("part", part_array(t, ["u"], n_parts))

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

        unioned = tagged.map_batches(rank_side, batch_format="pyarrow").union(
            edges.map_batches(edge_side, batch_format="pyarrow")
        )

        def probe(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return _CONTRIB_SCHEMA.empty_table()
            is_edge = part.column("is_edge").to_numpy(zero_copy_only=False) == 1
            if not is_edge.any():
                return _CONTRIB_SCHEMA.empty_table()
            u = part.column("u").to_numpy(zero_copy_only=False)
            rk_nodes = u[~is_edge]
            rk_vals = part.column("rank").to_numpy(zero_copy_only=False)[~is_edge]
            order = np.argsort(rk_nodes, kind="mergesort")
            rk_nodes, rk_vals = rk_nodes[order], rk_vals[order]
            eu = u[is_edge]
            pos = np.searchsorted(rk_nodes, eu)
            # every edge source is a node with a rank row in this partition
            w = part.column("w").to_numpy(zero_copy_only=False)[is_edge]
            ow = part.column("ow").to_numpy(zero_copy_only=False)[is_edge]
            contrib = rk_vals[pos] * w // ow
            return pa.table(
                {
                    "node": part.column("v").filter(pa.array(is_edge)),
                    "contrib": pa.array(contrib, pa.int64()),
                }
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
            return pa.table(
                {
                    "node": batch.column("node"),
                    "rank": pa.array(base + damping_pct * s // 100, pa.int64()),
                }
            )

        ranks = summed.map_batches(new_rank, batch_format="pyarrow")

    return ranks.sort(["rank", "node"], descending=[True, False])
