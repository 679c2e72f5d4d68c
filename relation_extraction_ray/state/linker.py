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


class LinkerStage:
    """Actor-pool stage: triples → triples + (subj_kb, obj_kb) columns.

    KB fetched zero-copy once per actor; context = the doc's surface
    tokens present in the row (subj/obj/pred words)."""

    def __init__(self, kb_ref) -> None:
        self.kb = ray.get(kb_ref)

    def _link(self, surface: str, context: set[str]) -> tuple[str, bool]:
        norm = surface_norm(surface)
        cands = self.kb.get(norm)
        if not cands:
            return nil_id(norm), False
        return score_candidates(norm, context, cands)["kb_id"], True

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        objs = batch.column("obj").to_pylist()
        preds = batch.column("pred").to_pylist()
        s_kb, o_kb, s_ok, o_ok = [], [], [], []
        for s, o, p in zip(subs, objs, preds):
            rel = p.lower().split("(")[0]
            context = {s.lower(), o.lower(), rel, *rel.split("-")}
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


def link_triples(triples: ray.data.Dataset, kb: dict[str, list[dict]], concurrency=(1, 8)) -> ray.data.Dataset:
    kb_ref = ray.put(kb)
    # task map with a per-worker stage cache — the KB ref ray.get is the
    # only state; actor-pool spin-up cost more than the whole query
    from ..taskexec import cached_stage_fn

    return triples.map_batches(
        cached_stage_fn(LinkerStage, kb_ref.hex(), {"kb_ref": kb_ref}),
        batch_format="pyarrow",
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
