"""Supervised relation-classification pipeline over SemEval-style labeled
sentences (SURVEY.md §3.3: the predict → score flow).

Stages: parsed records (tags stripped, entity indices known) → actor-pool
parse + pairless SDP extraction between the two given entities
(``convert_nominals_to_sdp``, ``semeval_data_helper.py:79-128``) →
[optional "single" reversed duplication M15] → prediction (trigger-lexicon
labeler + GRU confidence) → confusion matrix / P-R-F1 (A4).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..config import KGConfig
from ..nlp.labeler import OTHER, label_path, lookup_inverse_relation
from ..nlp.parser import parse_sentence
from ..nlp.sdp import post_process_path, sdp_between, token_span_path

PRED_SCHEMA = pa.schema(
    [
        ("sent_id", pa.int64()),
        ("pred", pa.string()),
        ("label", pa.string()),
        ("path_len", pa.int32()),
        ("reversed", pa.bool_()),
    ]
)


def _whitespace_token_offsets(text: str) -> list[int]:
    offs, pos = [], 0
    for tok in text.split(" "):
        offs.append(pos)
        pos += len(tok) + 1
    return offs


class ClassifyStage:
    """Actor-pool stage: parsed labeled sentence → predicted relation.

    The whitespace entity indices from ``convert_raw_x`` are re-anchored to
    parser tokens by char offset (the parser splits punctuation; offsets of
    the token *starts* are invariant)."""

    def __init__(self, cfg: KGConfig) -> None:
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out: dict[str, list] = {k: [] for k in ("sent_id", "pred", "label", "path_len", "reversed")}

        def emit(sid, pred, label, plen, rev):
            out["sent_id"].append(sid)
            out["pred"].append(pred)
            out["label"].append(label)
            out["path_len"].append(plen)
            out["reversed"].append(rev)

        for sid, text, e1_ws, e2_ws, label in zip(
            batch.column("sent_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("e1_idx").to_pylist(),
            batch.column("e2_idx").to_pylist(),
            batch.column("label").to_pylist(),
        ):
            sent = parse_sentence(text)
            ws_offs = _whitespace_token_offsets(text)
            idx_of = {off: i for i, off in enumerate(sent.idx)}
            e1 = idx_of.get(ws_offs[e1_ws]) if e1_ws < len(ws_offs) else None
            e2 = idx_of.get(ws_offs[e2_ws]) if e2_ws < len(ws_offs) else None
            if e1 is None or e2 is None:
                emit(sid, OTHER, label, 0, False)
                continue
            if cfg.sentence_mode:
                sdp = token_span_path(sent, e1, e2, include_ends=cfg.include_ends)
            else:
                sdp = sdp_between(sent, e1, e2, include_ends=cfg.include_ends)
            if sdp is None:
                emit(sid, OTHER, label, 0, False)
                continue
            path = post_process_path(sdp)
            if len(path) < cfg.min_len or len(path) > cfg.max_len:
                emit(sid, OTHER, label, len(path), False)
                continue
            words = [t[0] for t in path]
            emit(sid, label_path(words), label, len(path), False)
            if cfg.single:
                # M15: reversed duplicate — path read Y→X, label flipped
                # (semeval_data_helper.py:193-200; data_helper.py:70-80)
                emit(
                    sid,
                    lookup_inverse_relation(label_path(list(reversed(words)))),
                    lookup_inverse_relation(label),
                    len(path),
                    True,
                )
        return pa.Table.from_pydict(out, schema=PRED_SCHEMA)


def classify(parsed: ray.data.Dataset, cfg: KGConfig | None = None, concurrency=(1, 8)) -> ray.data.Dataset:
    return parsed.map_batches(
        ClassifyStage,
        fn_constructor_kwargs={"cfg": cfg or KGConfig()},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
