"""Entity-link disambiguator (SURVEY.md T8; north-star "entity-link
disambiguator" actor pool).

The reference uses raw lowercased surface forms as entity identities
(``wiki2sdp.py:184``); the engine adds a KB-linking stage between scoring
and canonicalization:

* a small knowledge base (alias → candidate KB entries) is broadcast once
  via ``ray.put`` and pinned per actor in ``__init__`` — the classic
  broadcast-join, no shuffle;
* disambiguation among candidate senses is deterministic: score =
  alias-match strength + context-token overlap with the entry's type
  hints, ties by kb_id — pure function of (surface, context), identical
  at any parallelism;
* unlinkable surfaces fall back to the surface-derived canonical id, so
  downstream canonicalization degrades gracefully (NIL entities).

A production deployment swaps ``score_candidates`` for a model forward
pass; the Ray plumbing (broadcast KB, actor pool, batch shapes) is what
this module fixes.
"""

from __future__ import annotations


import pyarrow as pa
import ray

LINKED_TRIPLES_EXTRA = [
    ("subj_kb", pa.string()),
    ("obj_kb", pa.string()),
    ("subj_linked", pa.bool_()),
    ("obj_linked", pa.bool_()),
]


# Alias keying uses the SAME normalization as canonicalization
# (nlp/normalize.py) so linked and unlinked entities partition identically.
from ..nlp.normalize import nil_id, surface_norm  # noqa: E402


def build_kb(entries: list[dict]) -> dict[str, list[dict]]:
    """entries: [{kb_id, name, aliases: [..], type_hints: [..]}] →
    alias-norm → candidate list (sorted by kb_id for determinism)."""
    kb: dict[str, list[dict]] = {}
    for e in entries:
        for alias in {e["name"], *e.get("aliases", [])}:
            kb.setdefault(surface_norm(alias), []).append(e)
    for cands in kb.values():
        cands.sort(key=lambda e: e["kb_id"])
    return kb


def score_candidates(norm: str, context: set[str], cands: list[dict]) -> dict:
    """Deterministic disambiguation: exact-name match beats alias match;
    context-token overlap with type_hints breaks the rest; kb_id final
    tie-break (stable)."""
    best, best_key = None, None
    for e in cands:
        exact = 1 if surface_norm(e["name"]) == norm else 0
        overlap = len(context & set(e.get("type_hints", ())))
        key = (-exact, -overlap, e["kb_id"])
        if best_key is None or key < best_key:
            best, best_key = e, key
    return best


def row_context(subj: str, obj: str, pred: str) -> set[str]:
    """The disambiguation context of one triple row — THE one definition
    shared by the broadcast and KB-sharded paths (bit-equality contract)."""
    rel = pred.lower().split("(")[0]
    return {subj.lower(), obj.lower(), rel, *rel.split("-")}


def link_surface(surface: str, context: set[str], cands: list[dict] | None) -> tuple[str, bool]:
    """Link one mention given its candidate list (None/[] → NIL fallback)."""
    norm = surface_norm(surface)
    if not cands:
        return nil_id(norm), False
    return score_candidates(norm, context, cands)["kb_id"], True


class LinkerStage:
    """Actor-pool stage: triples → triples + (subj_kb, obj_kb) columns.

    KB fetched zero-copy once per actor; context = the doc's surface
    tokens present in the row (subj/obj/pred words)."""

    def __init__(self, kb_ref) -> None:
        self.kb = ray.get(kb_ref)

    def _link(self, surface: str, context: set[str]) -> tuple[str, bool]:
        return link_surface(surface, context, self.kb.get(surface_norm(surface)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        objs = batch.column("obj").to_pylist()
        preds = batch.column("pred").to_pylist()
        s_kb, o_kb, s_ok, o_ok = [], [], [], []
        for s, o, p in zip(subs, objs, preds):
            context = row_context(s, o, p)
            kb_id, ok = self._link(s, context)
            s_kb.append(kb_id)
            s_ok.append(ok)
            kb_id, ok = self._link(o, context)
            o_kb.append(kb_id)
            o_ok.append(ok)
        out = batch
        for name, arr, typ in (
            ("subj_kb", s_kb, pa.string()),
            ("obj_kb", o_kb, pa.string()),
            ("subj_linked", s_ok, pa.bool_()),
            ("obj_linked", o_ok, pa.bool_()),
        ):
            out = out.append_column(name, pa.array(arr, typ))
        return out


#: Byte budget above which the KB stops being broadcast to every worker and
#: is hash-sharded instead (same planner decision as the verify joins in
#: functions/dedup.py — a byte bound transfers across cluster sizes, a row
#: count does not).  A production KB (10⁸ aliases) is far above this.
_KB_BROADCAST_BYTES = 32 << 20


def kb_nbytes(kb: dict[str, list[dict]]) -> int:
    """Deterministic byte estimate of a built alias→candidates KB (entries
    shared across aliases counted once + a pointer per extra alias)."""
    total = 0
    seen: set[int] = set()
    for alias, cands in kb.items():
        total += 64 + len(alias)
        for e in cands:
            if id(e) in seen:
                total += 8
                continue
            seen.add(id(e))
            total += (
                96
                + len(e["kb_id"])
                + len(e.get("name", ""))
                + sum(len(a) for a in e.get("aliases", ()))
                + sum(len(h) for h in e.get("type_hints", ()))
            )
    return total


def link_triples(
    triples: ray.data.Dataset,
    kb: dict[str, list[dict]],
    concurrency=(1, 8),
    broadcast_bytes: int = _KB_BROADCAST_BYTES,
) -> ray.data.Dataset:
    """Entity-link a triples dataset against ``kb``, picking the join
    strategy by KB size: small KBs are broadcast (``ray.put`` once, read in
    every task — no shuffle); KBs above ``broadcast_bytes`` are hash-sharded
    by alias norm and joined reduce-side (:func:`link_triples_partitioned`),
    bit-identically."""
    if kb_nbytes(kb) > broadcast_bytes and triples.schema() is not None:
        return link_triples_partitioned(triples, kb)
    kb_ref = ray.put(kb)
    # task map with a per-worker stage cache — the KB ref ray.get is the
    # only state; actor-pool spin-up cost more than the whole query
    from ..taskexec import cached_stage_fn

    return triples.map_batches(
        cached_stage_fn(LinkerStage, kb_ref.hex(), {"kb_ref": kb_ref}),
        batch_format="pyarrow",
    )


def link_triples_partitioned(
    triples: ray.data.Dataset,
    kb: dict[str, list[dict]],
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """KB-sharded reduce-side entity linking (the >broadcast-bound path).

    Two hash-partitioned exchanges, the same reduce-side-join shape as
    ``functions/joins.pair_payload_join``: exchange 1 co-locates every
    triple row with the KB alias shard of ``surface_norm(subj)`` and links
    the subject; exchange 2 re-keys the rows by ``surface_norm(obj)`` and
    links the object.  The KB ships as rows (alias norm → JSON candidate
    list) alongside the data — never materialized on any single worker —
    while unmatched surfaces keep the broadcast path's NIL fallback (left
    join, unlike ``pair_payload_join``'s inner join).  Disambiguation calls
    the same :func:`link_surface`/:func:`row_context` helpers as the
    broadcast path, so the two strategies are bit-identical (asserted in
    ``tests/test_linker_skew.py``).

    At 100 TB: triples rows cross two bounded keyed exchanges (the standard
    reduce-side join cost), KB shards are ``O(|KB| / n_parts)`` each, and
    ``n_parts`` derives from the alias count — no driver or per-worker
    whole-KB copy anywhere.  In production the alias table would be read
    from parquet shards; the dict→rows conversion here mirrors
    :func:`build_kb`'s in-memory contract."""
    import json

    from ..functions.joins import derive_n_parts, part_array

    base = triples.schema()
    base_fields = list(zip(base.names, base.types))
    n_parts = n_parts or derive_n_parts(len(kb), rows_per_part=20_000, cap=256)

    kb_table = pa.table(
        {
            "norm": pa.array(list(kb.keys()), pa.string()),
            "payload": pa.array(
                [json.dumps(c, sort_keys=True) for c in kb.values()], pa.string()
            ),
        }
    )

    extra = [
        ("role", pa.string()),
        ("norm", pa.string()),
        ("payload", pa.string()),
        ("subj_kb", pa.string()),
        ("subj_linked", pa.bool_()),
    ]
    mid_schema = pa.schema([("part", pa.int32())] + extra + base_fields)
    out_schema = pa.schema(
        base_fields
        + [
            ("subj_kb", pa.string()),
            ("obj_kb", pa.string()),
            ("subj_linked", pa.bool_()),
            ("obj_linked", pa.bool_()),
        ]
    )

    def kb_leg(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                part_array(batch, ["norm"], n_parts),
                pa.array(["K"] * n),
                batch.column("norm").combine_chunks(),
                batch.column("payload").combine_chunks(),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.bool_()),
            ]
            + [pa.nulls(n, t) for _, t in base_fields],
            schema=mid_schema,
        )

    def row_leg(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        norms = pa.array(
            [surface_norm(s) for s in batch.column("subj").to_pylist()], pa.string()
        )
        return pa.Table.from_arrays(
            [
                part_array(pa.table({"k": norms}), ["k"], n_parts),
                pa.array(["P"] * n),
                norms,
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.bool_()),
            ]
            + [batch.column(name).combine_chunks().cast(t) for name, t in base_fields],
            schema=mid_schema,
        )

    def _split(group: pa.Table):
        import numpy as np

        roles = group.column("role").combine_chunks().to_numpy(zero_copy_only=False)
        kmask = roles == "K"
        kt, pt = group.filter(pa.array(kmask)), group.filter(pa.array(~kmask))
        lookup = {
            n: json.loads(p)
            for n, p in zip(
                kt.column("norm").to_pylist(), kt.column("payload").to_pylist()
            )
        }
        return lookup, pt

    def link_subj(group: pa.Table) -> pa.Table:
        lookup, pt = _split(group)
        n = pt.num_rows
        if n == 0:
            return mid_schema.empty_table()
        subs = pt.column("subj").to_pylist()
        objs = pt.column("obj").to_pylist()
        preds = pt.column("pred").to_pylist()
        s_kb, s_ok, o_norms = [], [], []
        for s, o, p in zip(subs, objs, preds):
            kb_id, ok = link_surface(s, row_context(s, o, p), lookup.get(surface_norm(s)))
            s_kb.append(kb_id)
            s_ok.append(ok)
            o_norms.append(surface_norm(o))
        o_norm_arr = pa.array(o_norms, pa.string())
        return pa.Table.from_arrays(
            [
                part_array(pa.table({"k": o_norm_arr}), ["k"], n_parts),
                pa.array(["P"] * n),
                o_norm_arr,
                pa.nulls(n, pa.string()),
                pa.array(s_kb, pa.string()),
                pa.array(s_ok, pa.bool_()),
            ]
            + [pt.column(name).combine_chunks() for name, _ in base_fields],
            schema=mid_schema,
        )

    def link_obj(group: pa.Table) -> pa.Table:
        lookup, pt = _split(group)
        if pt.num_rows == 0:
            return out_schema.empty_table()
        subs = pt.column("subj").to_pylist()
        objs = pt.column("obj").to_pylist()
        preds = pt.column("pred").to_pylist()
        o_kb, o_ok = [], []
        for s, o, p in zip(subs, objs, preds):
            kb_id, ok = link_surface(o, row_context(s, o, p), lookup.get(surface_norm(o)))
            o_kb.append(kb_id)
            o_ok.append(ok)
        return pa.Table.from_arrays(
            [pt.column(name).combine_chunks() for name, _ in base_fields]
            + [
                pt.column("subj_kb").combine_chunks(),
                pa.array(o_kb, pa.string()),
                pt.column("subj_linked").combine_chunks(),
                pa.array(o_ok, pa.bool_()),
            ],
            schema=out_schema,
        )

    kb_ds = ray.data.from_arrow(kb_table).map_batches(kb_leg, batch_format="pyarrow")
    rows = triples.map_batches(row_leg, batch_format="pyarrow")
    mid = (
        kb_ds.union(rows)
        .groupby("part", num_partitions=n_parts)
        .map_groups(link_subj, batch_format="pyarrow")
    )
    return (
        kb_ds.union(mid)
        .groupby("part", num_partitions=n_parts)
        .map_groups(link_obj, batch_format="pyarrow")
    )


def synth_kb(seed: int = 42) -> list[dict]:
    """KB over the synthetic corpus inventory: one entry per lexeme,
    aliases = the generator's surface variants (case / plural), type hints
    = the pool the lexeme belongs to."""
    from ..sources.synth import AGENTS, COLLECTIONS, CONTAINERS, MESSAGES, PLACES, THINGS

    entries = []
    for pool, hint in (
        (AGENTS, "agent"),
        (THINGS, "thing"),
        (CONTAINERS, "container"),
        (PLACES, "place"),
        (COLLECTIONS, "collection"),
        (MESSAGES, "message"),
    ):
        for lex in pool:
            entries.append(
                {
                    "kb_id": f"kb_{hint}_{lex}",
                    "name": lex,
                    "aliases": [lex.capitalize(), lex.upper(), lex + "s"],
                    "type_hints": [hint],
                }
            )
    return entries
