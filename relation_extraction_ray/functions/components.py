"""Connected components over a pair table — duplicate-cluster folding.

The dedup family (``functions/dedup.py``, ``functions/ann.py``) emits
*pairs* ``(doc_a, doc_b)``; the operation a real training-data pipeline
runs next is folding those pairs into **clusters** and electing one
canonical document per cluster (keep-one dedup).  That is connected
components on the pair graph.

Algorithm: iterative **min-label propagation** ("hash-to-min" family,
Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds", ICDE 2013 — the simple variant here).  Each round
every edge forwards ``min(label_a, label_b)`` to both endpoints and each
node keeps the min of what it heard and what it had:

    labels ← (messages ∪ labels).groupby(node).min(label)

Each round is augmented with **pointer jumping** (label ← label[label]:
driver-side path compression in broadcast mode, where the map is
already resident; in partitioned mode one extra self-join of the label
table, engaged adaptively from round 3 so the common ≤2-round clique
workload never pays it), so total rounds are O(log diameter) —
near-dup clusters are
near-cliques (diameter 1-2, the init scan already reaches the fixpoint
and the loop runs one confirmation round) and even an adversarial
chain-shaped graph needs only logarithmically many keyed exchanges,
each moving O(|edges|) rows.  Labels only ever *decrease*, so
``sum(label)`` is monotone non-increasing and a round that leaves it
unchanged is the fixpoint — convergence is one tiny driver-side
aggregate per round, no old↔new join.

Scale shape (100 TB): the label table holds only nodes that appear in
at least one pair — O(|dup pairs|), ≪ corpus.  Below a byte bound the
round joins labels onto edges via one broadcast dict (``ray.put`` once,
read per batch); above it the round is two hash-partitioned exchanges
(:func:`..functions.joins.pair_payload_join`) keyed on
``blake2b(id) % n_parts``, same planner split as ``verify_jaccard`` /
``state/linker.py``.  Per-round label tables are ``materialize()``-d —
deliberately: they are the SMALL side, and re-deriving round k's labels
lazily would re-run all k-1 prior shuffles.

Reference: no counterpart (the reference never clusters its near-dups);
engine addition per the LLM-data-pipeline mandate.
"""

from __future__ import annotations

import time as _time

import numpy as np
import pyarrow as pa
import ray.data

from .joins import derive_n_parts, pair_payload_join, part_array

# broadcast-vs-partitioned planner bound for the per-round label join
# (labels are (int64 id → int64 label) dict entries, ~64 B each in a
# Python dict).  256 MiB ≈ 4M clustered nodes: the 1M-pair probe
# (BASELINE.md round 4) measured a 1.23M-node label dict at ~100 MB
# driver RSS finishing in 2 rounds / ~60 s with exact ground truth, so
# the broadcast path is preferred well past the linker's 32 MiB KB
# budget; above it the pair_payload_join rounds keep driver memory flat
# at the cost of 4 keyed exchanges per round.
_BROADCAST_LABEL_BYTES = 256 << 20
_EST_LABEL_BYTES = 64


def _empty_result(id_type: pa.DataType) -> ray.data.Dataset:
    empty = pa.Table.from_arrays(
        [pa.array([], id_type), pa.array([], id_type), pa.array([], pa.int64())],
        names=["doc_id", "canonical_id", "cluster_size"],
    )
    return ray.data.from_arrow(empty)


def _min_by_node(tab: pa.Table) -> pa.Table:
    """Arrow hash-aggregation min(lab) per node (per-batch partial)."""
    return tab.group_by("node").aggregate([("lab", "min")]).rename_columns(["node", "lab"])


class _RelabelBroadcastStage:
    """Per-batch edge relabel against a broadcast {node: label} dict
    (``ray.get`` once per worker process via ``cached_stage_fn``)."""

    def __init__(self, lab_ref, id_type) -> None:
        self.lab = ray.get(lab_ref)
        self.id_type = id_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        lab = self.lab
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        la = np.array([lab[x] for x in a], dtype=np.int64)
        lb = np.array([lab[x] for x in b], dtype=np.int64)
        m = np.minimum(la, lb)
        out = pa.Table.from_arrays(
            [
                pa.concat_arrays(
                    [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
                ).cast(self.id_type),
                pa.array(np.concatenate([m, m]), pa.int64()),
            ],
            names=["node", "lab"],
        )
        return _min_by_node(out)


def connected_components(
    pairs: ray.data.Dataset,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = 64,
    broadcast_bytes: int = _BROADCAST_LABEL_BYTES,
    round_stats: list | None = None,
) -> ray.data.Dataset:
    """Fold a pair table into duplicate clusters.

    Returns ``(doc_id, canonical_id, cluster_size)`` for every node that
    appears in at least one pair; ``canonical_id`` is the component-min
    id (the member a keep-one dedup would keep), ``cluster_size`` the
    component's node count.  Nodes in no pair are singletons by
    definition and are deliberately NOT emitted (output stays
    O(|dup pairs|), not O(corpus)).
    """
    pairs = pairs.materialize()
    sch = pairs.schema()
    if sch is None or id_a not in sch.names or pa.types.is_null(sch.types[sch.names.index(id_a)]):
        return _empty_result(pa.int64())
    id_type = sch.types[sch.names.index(id_a)]

    edges = pairs.map_batches(
        lambda t: t.select([id_a, id_b]).rename_columns(["a", "b"]),
        batch_format="pyarrow",
    ).materialize()
    if edges.count() == 0:
        return _empty_result(id_type)

    # init: label(node) = min(node, min over incident edges' other end) —
    # the first propagation round folded into the init scan (free: the
    # same per-batch-partial → groupby-min reduction either way).  For
    # near-clique dup clusters this IS already the fixpoint, so the loop
    # below runs exactly one confirmation round.
    def init_labels(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        both = pa.concat_arrays([a, b]).cast(id_type)
        m = np.minimum(
            a.cast(pa.int64()).to_numpy(zero_copy_only=False),
            b.cast(pa.int64()).to_numpy(zero_copy_only=False),
        )
        return _min_by_node(
            pa.Table.from_arrays(
                [both, pa.array(np.concatenate([m, m]), pa.int64())],
                names=["node", "lab"],
            )
        )

    labels = edges.map_batches(init_labels, batch_format="pyarrow")
    # Partition sizing: CC rows are 16-byte (node, lab) pairs, so the
    # default derive_n_parts (4096 rows/part, tuned for heavy per-group
    # dedup verification) over-partitions catastrophically — at 1M edges
    # it yields 244 parts × ~500 input blocks ≈ 122k shuffle objects PER
    # SORT, and the pull-based shuffle coordinator pegged the driver at
    # 94 % CPU / 16 GB RSS with every worker idle (measured).  64k rows
    # (~1 MB) per partition keeps each exchange to a few hundred objects
    # while staying multi-core; the 256 cap bounds per-partition rows at
    # ~4M (~64 MB) at cluster scale.
    n_parts = derive_n_parts(edges.count(), rows_per_part=1 << 16)
    labels = _global_min(labels, n_parts).materialize()
    prev_sum = _label_sum(labels)

    n_nodes = labels.count()
    use_broadcast = n_nodes * _EST_LABEL_BYTES <= broadcast_bytes

    for rnd in range(max_rounds):
        if use_broadcast:
            from ..taskexec import cached_stage_fn

            lab_map: dict = {}
            for bt in labels.iter_batches(batch_format="pyarrow"):
                lab_map.update(
                    zip(
                        bt.column("node").to_pylist(),
                        bt.column("lab").to_pylist(),
                    )
                )
            # path compression (pointer jumping, driver-side — the map is
            # already resident here): collapse label chains so a round
            # propagates ROOTS, not one-hop labels.  Turns O(diameter)
            # rounds into O(log d) on chain-shaped graphs; no-op on the
            # near-clique dup-cluster workload.  Labels are node ids, so
            # label-of-label is always defined.
            for k in lab_map:
                r = lab_map[k]
                while lab_map.get(r, r) != r:
                    r = lab_map[r]
                lab_map[k] = r
            lab_ref = ray.put(lab_map)
            messages = edges.map_batches(
                cached_stage_fn(
                    _RelabelBroadcastStage,
                    lab_ref.hex(),
                    {"lab_ref": lab_ref, "id_type": id_type},
                ),
                batch_format="pyarrow",
            )
        else:
            joined = pair_payload_join(
                edges,
                labels.map_batches(
                    lambda t: t.rename_columns(["id", "payload"]), batch_format="pyarrow"
                ),
                id_type,
                pa.int64(),
                n_parts,
            )

            def relabel(batch: pa.Table) -> pa.Table:
                la = batch.column("payload_a").to_numpy(zero_copy_only=False)
                lb = batch.column("payload_b").to_numpy(zero_copy_only=False)
                m = np.minimum(la, lb).astype(np.int64)
                return _min_by_node(
                    pa.Table.from_arrays(
                        [
                            pa.concat_arrays(
                                [
                                    batch.column("a").combine_chunks(),
                                    batch.column("b").combine_chunks(),
                                ]
                            ).cast(id_type),
                            pa.array(np.concatenate([m, m]), pa.int64()),
                        ],
                        names=["node", "lab"],
                    )
                )

            messages = joined.map_batches(relabel, batch_format="pyarrow")

        t_round = _time.monotonic()
        labels = _global_min(messages.union(labels), n_parts).materialize()
        if not use_broadcast and rnd >= 2:
            # distributed pointer jump: one extra keyed join per round
            # replaces each label with its label's label (monotone:
            # label[x] <= x always, so label[lab] <= lab) — O(log d)
            # total rounds on chain-shaped graphs instead of O(d).
            # Engaged ADAPTIVELY from round 3: the near-clique dup-cluster
            # workload converges in ≤2 rounds (init fixpoint +
            # confirmation) and must not pay the extra keyed join
            # (measured 3.3× on the partitioned bit-equality test when
            # unconditional); a graph still unconverged after 2 rounds is
            # chain/tree-shaped, exactly where jumping wins.
            labels = _pointer_jump(labels, id_type, n_parts).materialize()
        cur_sum = _label_sum(labels)
        if round_stats is not None:
            round_stats.append(
                {"mode": "broadcast" if use_broadcast else "partitioned",
                 "wall_s": round(_time.monotonic() - t_round, 2), "label_sum": cur_sum}
            )
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    # stamp cluster sizes: one keyed exchange on canonical_id
    def stamp_size(group: pa.Table) -> pa.Table:
        n = group.num_rows
        return pa.Table.from_arrays(
            [
                group.column("node").combine_chunks(),
                group.column("lab").combine_chunks().cast(id_type),
                pa.array(np.full(n, n, dtype=np.int64), pa.int64()),
            ],
            names=["doc_id", "canonical_id", "cluster_size"],
        )

    return labels.groupby("lab").map_groups(stamp_size, batch_format="pyarrow")


def _pointer_jump(labels: ray.data.Dataset, id_type: pa.DataType, n_parts: int) -> ray.data.Dataset:
    """label ← label[label] for every node, as ONE keyed exchange of the
    label table against itself (cheaper than the generic
    :func:`pair_payload_join`, which would spend a second exchange
    resolving the ``node`` leg we don't need).  Every label row ships
    twice — once keyed on ``part(node)`` as the lookup side (role S),
    once keyed on ``part(lab)`` as the probe side (role P); per
    partition a vectorized ``index_in`` probe replaces each probe row's
    lab with the lab of the node it points at.  Labels are node ids of
    nodes present in the table, so the probe always hits (a miss keeps
    the old lab — still correct, jumping is an accelerator not a
    correctness step); node rows are unique so no re-aggregation is
    needed."""
    import pyarrow.compute as pc

    def two_legs(t: pa.Table) -> pa.Table:
        node = t.column("node").combine_chunks().cast(id_type)
        lab64 = t.column("lab").combine_chunks().cast(pa.int64())
        lab_id = lab64.cast(id_type)
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                pa.concat_arrays(
                    [
                        part_array(pa.table({"k": node}), ["k"], n_parts),
                        part_array(pa.table({"k": lab_id}), ["k"], n_parts),
                    ]
                ),
                pa.array(["S"] * n + ["P"] * n),
                pa.concat_arrays([node, node]),
                pa.concat_arrays([lab64, lab64]),
            ],
            names=["part", "role", "node", "lab"],
        )

    def jump(group: pa.Table) -> pa.Table:
        roles = group.column("role").combine_chunks().to_numpy(zero_copy_only=False)
        smask = roles == "S"
        s_rows = group.filter(pa.array(smask))
        p_rows = group.filter(pa.array(~smask))
        idx = pc.index_in(
            p_rows.column("lab").combine_chunks().cast(id_type),
            value_set=s_rows.column("node").combine_chunks(),
        )
        jumped = pc.take(s_rows.column("lab").combine_chunks(), idx)
        new_lab = pc.if_else(pc.is_valid(jumped), jumped, p_rows.column("lab").combine_chunks())
        return pa.Table.from_arrays(
            [p_rows.column("node").combine_chunks(), new_lab.cast(pa.int64())],
            names=["node", "lab"],
        )

    return (
        labels.map_batches(two_legs, batch_format="pyarrow")
        .groupby("part", num_partitions=n_parts)
        .map_groups(jump, batch_format="pyarrow")
    )


def _global_min(node_lab: ray.data.Dataset, n_parts: int) -> ray.data.Dataset:
    """groupby(node).min(lab) renamed back to (node, lab).

    ``num_partitions`` pins the SHUFFLE partition count, but the
    aggregate still emits one block per input block, so the round loop
    COMPOUNDS block count (round k's labels ∪ messages feed round k+1's
    aggregate) — measured 1.3 s → 4.3 s → 15.2 s per round on an 8-edge
    toy graph, and 23 → 36 → 66 → 113 s per round on the 5.2M-pair
    media-dedup probe (round 5) until the explicit ``repartition``
    below restored flat ~23 s rounds; same bfs_hops discipline."""
    agg = (
        node_lab.repartition(n_parts)
        .groupby("node", num_partitions=n_parts)
        .min("lab")
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["node", "lab"]), batch_format="pyarrow"
    )


def _label_sum(labels: ray.data.Dataset) -> int:
    """Convergence scalar: labels only decrease, so an unchanged sum is
    the fixpoint.  int64-safe for ids < 2^40 over < 2^23 nodes; the
    driver holds one number."""
    s = labels.sum("lab")
    return int(s["sum(lab)"] if isinstance(s, dict) else s)


# broadcast-vs-partitioned planner bound for the keep-one drop set: the
# drop ids ship as ONE Arrow array (zero-copy reads from the object
# store), so the estimate is raw id bytes, not dict-entry bytes.
# 128 MiB ≈ 16M int64 drop ids; a 30-60 %-duplicated web crawl at
# 10⁹+ docs blows past this, which is exactly when the anti-join below
# must run reduce-side instead of OOMing the driver.
_DROP_BROADCAST_BYTES = 128 << 20


def dedup_keep_one(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    broadcast_bytes: int = _DROP_BROADCAST_BYTES,
) -> ray.data.Dataset:
    """Keep-one near-dup dedup: drop every clustered document except its
    cluster's canonical (component-min id) member — the operation the
    pair-emitting dedup family exists to feed.

    ``pairs`` is any near-dup pair table (minhash / ngram-Jaccard /
    simhash / embedding); clusters come from
    :func:`connected_components`.  Join-strategy pick, the same planner
    split as ``verify_jaccard`` / ``state/linker.py`` (byte bound, not
    row count — transfers across cluster sizes):

    * drop set ≤ ``broadcast_bytes``: the non-canonical ids ship once
      via ``ray.put`` and the filter is one streaming ``is_in`` over the
      corpus — no shuffle of document rows;
    * above the bound (a heavily duplicated crawl: 30-60 % dup rate
      makes the drop set O(corpus)): a **hash-partitioned reduce-side
      anti-join** — docs and drop ids co-partitioned by
      ``hash(id) % n_parts`` through one keyed exchange, each partition
      filtered independently; driver memory stays flat.  Bit-identical
      to the broadcast path (asserted in
      ``tests/test_components.py::test_keep_one_partitioned_bitequal``).
    """
    cc = connected_components(pairs, id_a=id_a, id_b=id_b)

    def non_canon(bt: pa.Table) -> pa.Table:
        neq = pa.compute.invert(
            pa.compute.equal(bt.column("doc_id"), bt.column("canonical_id"))
        )
        return pa.table({"__drop_id__": bt.column("doc_id").filter(neq)})

    drops = cc.map_batches(non_canon, batch_format="pyarrow").materialize()

    # exact drop-set byte size from the materialized blocks' metadata-level
    # nbytes — an aggregate-sized fold, never the values themselves
    drop_nbytes = 0
    n_drop = 0
    for bt in drops.iter_batches(batch_format="pyarrow"):
        drop_nbytes += bt.column("__drop_id__").nbytes
        n_drop += bt.num_rows

    if drop_nbytes <= broadcast_bytes:
        drop_arr = (
            pa.concat_arrays(
                [
                    bt.column("__drop_id__").combine_chunks()
                    for bt in drops.iter_batches(batch_format="pyarrow")
                    if bt.num_rows
                ]
            )
            if n_drop
            else pa.array([], pa.int64())
        )
        drop_ref = ray.put(drop_arr)

        def keep(batch: pa.Table) -> pa.Table:
            drop = ray.get(drop_ref)
            if len(drop) == 0:
                return batch
            mask = pa.compute.invert(
                pa.compute.is_in(batch.column(id_col), value_set=drop)
            )
            return batch.filter(mask)

        return docs.map_batches(keep, batch_format="pyarrow")

    # --- partitioned anti-join (the >broadcast-bound path) ----------------
    # One keyed exchange moving docs rows + drop ids; each reduce group
    # holds every doc and every drop id of one hash partition, so the
    # in-group is_in is exact.  Docs and drops union through a shared
    # schema: drop rows carry nulls in every non-id column plus a marker.
    doc_schema = docs.schema()
    names = list(doc_schema.names)
    types = list(doc_schema.types)
    n_parts = derive_n_parts(n_drop, rows_per_part=1 << 16)

    def tag_docs(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part__", part_array(batch, [id_col], n_parts)
        ).append_column(
            "__isdrop__", pa.array(np.zeros(batch.num_rows, dtype=bool), pa.bool_())
        )

    def tag_drops(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for nm, t in zip(names, types):
            if nm == id_col:
                cols.append(batch.column("__drop_id__").combine_chunks().cast(t))
            else:
                cols.append(pa.nulls(n, t))
        t2 = pa.Table.from_arrays(cols, names=names)
        return t2.append_column(
            "__part__", part_array(t2, [id_col], n_parts)
        ).append_column(
            "__isdrop__", pa.array(np.ones(n, dtype=bool), pa.bool_())
        )

    tagged = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        drops.map_batches(tag_drops, batch_format="pyarrow")
    )

    def anti(group: pa.Table) -> pa.Table:
        is_drop = group.column("__isdrop__").combine_chunks()
        drop_ids = group.column(id_col).filter(is_drop).combine_chunks()
        doc_rows = group.filter(pa.compute.invert(is_drop))
        if len(drop_ids):
            mask = pa.compute.invert(
                pa.compute.is_in(doc_rows.column(id_col), value_set=drop_ids)
            )
            doc_rows = doc_rows.filter(mask)
        return doc_rows.drop_columns(["__part__", "__isdrop__"])

    return tagged.groupby("__part__").map_groups(anti, batch_format="pyarrow")
