"""SemEval-2010-Task-8-style labeled-sentence source (SURVEY.md S2/S3, M1).

The reference parses 4-line records — ``id<TAB>"<sentence with <e1>/<e2>
tags>"``, label, ``Comment:``, blank — and strips the entity tags while
recording entity token indices (``semeval_data_helper.py:242-358``, tag
handling ``:8-48``).  Here:

* a deterministic generator emits the same record format from the synthetic
  grammar (FIXTURES.md F2) so tests need no external corpus;
* ``read_semeval_records`` reads record files distributed — one Ray task
  per file via ``read_binary_files`` (files are the atomic record unit; a
  line-level reader would need order-sensitive window-of-4 regrouping
  across block boundaries);
* ``convert_raw_x`` reproduces the tag-strip semantics, including the
  corner cases where tags are glued to neighboring tokens.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray

from ..nlp.labeler import TRIGGER2REL
from .synth import _relation_sentence  # deterministic template grammar

RECORD_SCHEMA = pa.schema(
    [
        ("sent_id", pa.int64()),
        ("text", pa.string()),  # raw, with <e1>..</e1> <e2>..</e2> tags
        ("label", pa.string()),
        ("comment", pa.string()),
    ]
)

PARSED_SCHEMA = pa.schema(
    [
        ("sent_id", pa.int64()),
        ("text", pa.string()),  # tags stripped
        ("e1_idx", pa.int32()),  # token index of e1 head
        ("e2_idx", pa.int32()),
        ("label", pa.string()),
    ]
)

_TAG_RE = re.compile(r"</?e[12]>")


def tag_entity_heads(text: str, subj: str, obj: str) -> str:
    """Wrap the first occurrence of subj/obj head tokens with <e1>/<e2> tags
    (generator side; subj is e1 = first mention in sentence order)."""

    def wrap(s: str, tag: str, start: int = 0) -> tuple[str, int]:
        pat = re.compile(r"\b" + re.escape(s) + r"\b", re.IGNORECASE)
        m = pat.search(s_text, start)
        assert m, (s, s_text)
        return (
            s_text[: m.start()] + f"<{tag}>" + m.group(0) + f"</{tag}>" + s_text[m.end() :],
            m.end() + len(tag) * 2 + 5,
        )

    s_text = text
    s_text, nxt = wrap(subj, "e1")
    s_text, _ = wrap(obj, "e2", nxt)
    return s_text


def gen_labeled_sentence(i: int, seed: int = 42) -> dict:
    """Pure function of (seed, i) → one labeled record (F2 fixture)."""
    import random

    rng = random.Random(f"sem:{seed}:{i}")
    text, subj, label, obj = _relation_sentence(rng)
    return {
        "sent_id": i + 1,
        "text": tag_entity_heads(text, subj, obj),
        "label": label,
        "comment": f"Comment: synthetic {i}",
    }


def labeled_sentences_table(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    return pa.Table.from_pylist([gen_labeled_sentence(i, seed) for i in range(start, start + n)], schema=RECORD_SCHEMA)


def write_record_file(path: str, table: pa.Table) -> None:
    """Serialize to the reference's 4-line TRAIN_FILE.TXT format
    (``semeval_data_helper.py:253-259``)."""
    with open(path, "w") as f:
        for r in table.to_pylist():
            f.write(f"{r['sent_id']}\t\"{r['text']}\"\n{r['label']}\n{r['comment']}\n\n")


def parse_record_text(content: str) -> list[dict]:
    """4-line records → rows; label-less (test) files: 1 line per record
    (``semeval_data_helper.py:338-356``)."""
    lines = content.splitlines()
    rows = []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        sid_str, _, rest = line.partition("\t")
        text = rest.strip().strip('"')
        label, comment = "", ""
        if i + 1 < len(lines) and lines[i + 1].strip() and "\t" not in lines[i + 1]:
            label = lines[i + 1].strip()
            comment = lines[i + 2].strip() if i + 2 < len(lines) else ""
            i += 4
        else:
            i += 1
        rows.append({"sent_id": int(sid_str), "text": text, "label": label, "comment": comment})
    return rows


def read_semeval_records(paths: str | list[str]) -> ray.data.Dataset:
    """Distributed record reader: one task per file."""

    def parse(batch: dict) -> pa.Table:
        rows: list[dict] = []
        for data in batch["bytes"]:
            rows.extend(parse_record_text(bytes(data).decode("utf-8")))
        return pa.Table.from_pylist(rows, schema=RECORD_SCHEMA)

    return ray.data.read_binary_files(paths).map_batches(parse, batch_format="numpy")


def convert_raw_x(raw_text: str) -> tuple[str, int, int] | None:
    """Strip ``<e1>/<e2>`` tags and return (clean_text, e1_token_idx,
    e2_token_idx) — M1 semantics (``semeval_data_helper.py:8-48``): tags may
    be glued to adjacent tokens; entity index = index of the first token of
    the tagged span in the whitespace tokenization of the cleaned text."""
    # normalize: ensure space around tags so the span is token-aligned
    spaced = re.sub(r"(<e[12]>)", r" \1", raw_text)
    spaced = re.sub(r"(</e[12]>)", r"\1 ", spaced)
    toks = spaced.split()
    clean: list[str] = []
    e1 = e2 = -1
    for tok in toks:
        if tok.startswith("<e1>"):
            e1 = len(clean)
        elif tok.startswith("<e2>"):
            e2 = len(clean)
        stripped = _TAG_RE.sub("", tok)
        if stripped:
            clean.append(stripped)
    if e1 < 0 or e2 < 0:
        return None
    return " ".join(clean), e1, e2


#: Sentinel text substituted for unparseable records (S3 policy,
#: ``semeval_data_helper.py:338-356``): the reference replaces failed test
#: parses with ``<OOV>`` rows so sentence ids stay DENSE — the official
#: scorer keys predictions by line id and a gap would misalign every
#: following row.
SENTINEL_TEXT = "<OOV>"


def parse_records_batch(batch: pa.Table, sentinel: bool = True) -> pa.Table:
    """records → PARSED_SCHEMA rows (plain function of one Arrow batch —
    shared by the Ray stage and the single-process oracle).

    ``sentinel=True`` reproduces the reference's S3 policy: a record whose
    tags can't be parsed becomes an ``<OOV>`` sentinel row (e1=e2=0) so ids
    stay dense; ``sentinel=False`` drops it (id gap)."""
    out: dict[str, list] = {k: [] for k in ("sent_id", "text", "e1_idx", "e2_idx", "label")}
    for sid, text, label in zip(
        batch.column("sent_id").to_pylist(),
        batch.column("text").to_pylist(),
        batch.column("label").to_pylist(),
    ):
        parsed = convert_raw_x(text)
        if parsed is None:
            if not sentinel:
                continue
            parsed = (SENTINEL_TEXT, 0, 0)
        clean, e1, e2 = parsed
        out["sent_id"].append(sid)
        out["text"].append(clean)
        out["e1_idx"].append(e1)
        out["e2_idx"].append(e2)
        out["label"].append(label)
    return pa.Table.from_pydict(out, schema=PARSED_SCHEMA)


def parsed_records(records: ray.data.Dataset, sentinel: bool = True) -> ray.data.Dataset:
    """Distributed wrapper over :func:`parse_records_batch`."""

    def conv(batch: pa.Table) -> pa.Table:
        return parse_records_batch(batch, sentinel=sentinel)

    return records.map_batches(conv, batch_format="pyarrow")
