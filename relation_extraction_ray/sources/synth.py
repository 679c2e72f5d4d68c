"""Deterministic synthetic corpus of interleaved text+media documents.

Produces the ``input_hint`` table shape — ``doc_id: string,
spans: list<struct<kind, text, media_ref, offset:int32>>`` — from a closed
template grammar whose sentences carry *known* gold triples (FIXTURES.md F1,
F3). Every document is a pure function of ``(seed, doc_index)``: generation
is distributed (``ray.data.range(n) → map_batches``), resumable, and
identical at any parallelism level. No external data, no wall-clock, no
global RNG.

The grammar mirrors the relation inventory of SemEval-2010 Task 8
(``semeval_data_helper.py:208-229``): 9 directed relations × active/passive
voice + ``Other`` distractors, with media spans interleaved between text
spans to exercise the per-row span-sequence invariant.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

from .. import schemas
from ..nlp.labeler import TRIGGER2REL

_SYLLABLES = [
    "zor", "bal", "quin", "vex", "tor", "mel", "dra", "fun", "gol", "ril",
    "sab", "tek", "ulm", "ver", "wix", "yar", "pol", "nim", "kas", "hob",
    "dur", "fen", "gim", "lun", "mok", "nar", "osk", "pex", "rud", "tav",
]
_BAD_SUFFIXES = (
    "ous", "ful", "ive", "al", "ic", "able", "ible", "ish", "less", "ed", "ing", "ly",
)


def _invent_tokens(n: int, seed: int) -> list[str]:
    """n distinct invented noun lexemes that our tagger will tag NOUN/PROPN
    (no function-word / suffix collisions)."""
    rng = random.Random(seed)
    out: list[str] = []
    seen = set(TRIGGER2REL)
    while len(out) < n:
        k = rng.choice((2, 2, 3))
        tok = "".join(rng.choice(_SYLLABLES) for _ in range(k))
        if tok in seen or tok.endswith(_BAD_SUFFIXES):
            continue
        seen.add(tok)
        out.append(tok)
    return out


_INVENTORY = _invent_tokens(240, seed=42)
AGENTS = _INVENTORY[0:60]        # rendered capitalized (PROPN)
THINGS = _INVENTORY[60:120]      # "the <thing>"
CONTAINERS = _INVENTORY[120:150]
PLACES = _INVENTORY[150:180]
COLLECTIONS = _INVENTORY[180:210]
MESSAGES = _INVENTORY[210:240]

# (trigger, subj_pool, obj_pool, passive_ok)
_TEMPLATES = [
    ("caused", THINGS, THINGS, True),
    ("triggered", THINGS, THINGS, True),
    ("sparked", THINGS, THINGS, True),
    ("produced", AGENTS, THINGS, True),
    ("created", AGENTS, THINGS, True),
    ("made", AGENTS, THINGS, True),
    ("came", THINGS, PLACES, False),        # ... from the <place>
    ("originated", THINGS, PLACES, False),  # ... from the <place>
    ("used", AGENTS, THINGS, True),
    ("wielded", AGENTS, THINGS, True),
    ("comprised", THINGS, THINGS, True),
    ("included", COLLECTIONS, THINGS, True),
    ("held", CONTAINERS, THINGS, True),
    ("stored", CONTAINERS, THINGS, True),
    ("moved", THINGS, PLACES, False),       # ... into the <place>
    ("entered", AGENTS, PLACES, False),     # ... into the <place>
    ("shipped", AGENTS, CONTAINERS, False),  # ... to the <container>
    ("joined", AGENTS, COLLECTIONS, True),
    ("belonged", AGENTS, COLLECTIONS, False),  # ... to the <collection>
    ("described", MESSAGES, THINGS, True),
    ("discussed", MESSAGES, THINGS, True),
]
_TRIGGER_PREP = {
    "came": "from", "originated": "from",
    "moved": "into", "entered": "into",
    "shipped": "to", "belonged": "to",
}
_DISTRACTOR_PREPS = ["near", "in", "on", "at"]
_ADVERBS = ["yesterday", "recently", "quickly", "carefully"]
_MEDIA = [("image", "png"), ("audio", "wav"), ("video", "mp4")]


def _cap(np_text: str) -> str:
    """Sentence-initial capitalization that preserves case variants
    (``"ZORBAL"`` stays upper; ``.capitalize()`` would destroy it)."""
    return np_text[0].upper() + np_text[1:]


def _pick_skewed(rng: random.Random, pool: list[str]) -> str:
    """Zipf-ish pick: ~20% of draws hit pool[0] (head-entity skew, F6)."""
    if rng.random() < 0.2:
        return pool[0]
    return pool[rng.randrange(len(pool))]


def _render_np(rng: random.Random, lex: str, propn: bool) -> tuple[str, str]:
    """Render a noun phrase; returns (text, head_surface_lower).

    Surface variants (case / plural / possessive-free base) exercise entity
    canonicalization: variants normalize to the same canonical key.
    """
    variant = rng.random()
    if propn:
        surface = lex.capitalize()
        if variant < 0.15:
            surface = lex.upper()  # case variant
        return surface, surface.lower()
    word = lex
    if variant < 0.15:
        word = lex + "s"  # plural variant
    return f"the {word}", word


def _relation_sentence(rng: random.Random) -> tuple[str, str, str, str]:
    """→ (sentence_text, subj_head_lower, gold_label, obj_head_lower)."""
    trig, subj_pool, obj_pool, passive_ok = _TEMPLATES[rng.randrange(len(_TEMPLATES))]
    rel, direction, _ = TRIGGER2REL[trig]
    subj_lex = _pick_skewed(rng, subj_pool)
    obj_lex = obj_pool[rng.randrange(len(obj_pool))]
    if subj_lex == obj_lex:
        obj_lex = obj_pool[(obj_pool.index(obj_lex) + 1) % len(obj_pool)]
    subj_np, subj = _render_np(rng, subj_lex, subj_pool is AGENTS)
    obj_np, obj = _render_np(rng, obj_lex, obj_pool is AGENTS)
    prep = _TRIGGER_PREP.get(trig)
    passive = passive_ok and rng.random() < 0.25
    adv = f" {rng.choice(_ADVERBS)}" if rng.random() < 0.3 else ""
    if passive:
        text = f"{_cap(obj_np)} was {trig} by {subj_np}{adv}."
        label = rel + ("(e2,e1)" if direction == "(e1,e2)" else "(e1,e2)")
        # X (first mention) is the object NP in passive voice
        return text, obj, label, subj
    middle = f" {prep} " if prep else " "
    tail = ""
    if rng.random() < 0.25:
        tail = f" {rng.choice(_DISTRACTOR_PREPS)} the {rng.choice(PLACES)}"
    text = f"{_cap(subj_np)} {trig}{middle}{obj_np}{tail}{adv}."
    return text, subj, rel + direction, obj


def _distractor_sentence(rng: random.Random) -> str:
    a = rng.choice(AGENTS).capitalize()
    b = rng.choice(PLACES)
    v = rng.choice(["visited", "analyzed", "covered", "mentioned"])
    return f"{a} {v} the {b}."


def span_sequence_hash(kinds, texts, refs) -> int:
    """uint64 hash of the ordered (kind, text, media_ref) sequence — the
    per-row invariant carrier checked at every stage boundary (BASELINE.json
    input_hint). blake2b, PYTHONHASHSEED-independent."""
    h = hashlib.blake2b(digest_size=8)
    for k, t, r in zip(kinds, texts, refs):
        h.update(k.encode())
        h.update(b"\x00")
        h.update(t.encode())
        h.update(b"\x00")
        h.update(r.encode())
        h.update(b"\x01")
    return int.from_bytes(h.digest(), "big")


def gen_doc(doc_index: int, seed: int = 42) -> tuple[dict, list[dict]]:
    """One document + its gold triples; pure function of (seed, doc_index)."""
    rng = random.Random(f"{seed}:{doc_index}")
    doc_id = f"doc{doc_index:09d}"
    n_sent = rng.randint(1, 4)
    spans: list[dict] = []
    gold: list[dict] = []
    offset = 0
    sent_id = 0
    media_k = 0
    for _ in range(n_sent):
        if rng.random() < 0.3:
            kind, ext = _MEDIA[rng.randrange(3)]
            spans.append(
                {"kind": kind, "text": "", "media_ref": f"mem://{doc_id}/{media_k}.{ext}", "offset": offset}
            )
            media_k += 1
            offset += 1
        if rng.random() < 0.8:
            text, subj, label, obj = _relation_sentence(rng)
            gold.append({"doc_id": doc_id, "sent_id": sent_id, "subj": subj, "pred": label, "obj": obj})
        else:
            text = _distractor_sentence(rng)
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        offset += len(text) + 1
        sent_id += 1
    if rng.random() < 0.15:
        kind, ext = _MEDIA[rng.randrange(3)]
        spans.append({"kind": kind, "text": "", "media_ref": f"mem://{doc_id}/{media_k}.{ext}", "offset": offset})
    return {"doc_id": doc_id, "spans": spans}, gold


def corpus_table(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows = [gen_doc(i, seed)[0] for i in range(start, start + n_docs)]
    return pa.Table.from_pylist(rows, schema=schemas.DOCUMENTS)


def gold_table(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows: list[dict] = []
    for i in range(start, start + n_docs):
        rows.extend(gen_doc(i, seed)[1])
    return pa.Table.from_pylist(rows, schema=schemas.GOLD_TRIPLES)


def documents_dataset(n_docs: int, seed: int = 42, override_num_blocks: int | None = None):
    """Distributed generation: ``ray.data.range(n) → map_batches`` — no
    driver-side materialization (scale path for the 10^12-doc design)."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        rows = [gen_doc(i, seed)[0] for i in ids]
        return pa.Table.from_pylist(rows, schema=schemas.DOCUMENTS)

    ds = ray.data.range(n_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=2048)


def gold_dataset(n_docs: int, seed: int = 42, override_num_blocks: int | None = None):
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for i in batch.column("id").to_pylist():
            rows.extend(gen_doc(i, seed)[1])
        return pa.Table.from_pylist(rows, schema=schemas.GOLD_TRIPLES)

    ds = ray.data.range(n_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=2048)
