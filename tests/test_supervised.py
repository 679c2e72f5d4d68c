"""SemEval-style source (S2/S3, M1), supervised classification pipeline,
and the A4 evaluation metrics."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray

from relation_extraction_ray.config import KGConfig
from relation_extraction_ray.eval import evaluate_classification, prf_from_counts, score_triples
from relation_extraction_ray.pipelines.supervised import classify
from relation_extraction_ray.sources.semeval import (
    convert_raw_x,
    labeled_sentences_table,
    parse_record_text,
    parsed_records,
    read_semeval_records,
    write_record_file,
)

N = 200


def test_convert_raw_x_corner_cases():
    # plain — tag-adjacent punctuation detaches (re-tokenization, like the
    # reference's post-strip re-parse)
    assert convert_raw_x('The <e1>cat</e1> sat on the <e2>mat</e2>.') == ("The cat sat on the mat .", 1, 5)
    # tags glued to neighboring chars (M1 whitespace corner cases)
    text, e1, e2 = convert_raw_x('A <e1>storm</e1>-force <e2>wind</e2>, hit.')
    assert e1 == 1 and text.split()[1] == "storm" and text.split()[e2] == "wind"
    # missing tag -> None
    assert convert_raw_x("no tags here") is None


def test_record_roundtrip(tmp_path, ray_session):
    tab = labeled_sentences_table(25)
    path = str(tmp_path / "train.txt")
    write_record_file(path, tab)
    # plain-python parse
    rows = parse_record_text(open(path).read())
    assert len(rows) == 25
    assert rows[0]["sent_id"] == 1 and rows[0]["label"] == tab.column("label")[0].as_py()
    # distributed reader
    ds_rows = sorted(read_semeval_records(path).take_all(), key=lambda r: r["sent_id"])
    assert [r["text"] for r in ds_rows] == [r["text"] for r in tab.to_pylist()]


@pytest.fixture(scope="module")
def preds(ray_session):
    tab = labeled_sentences_table(N)
    records = ray.data.from_arrow(tab).repartition(4)
    parsed = parsed_records(records)
    return classify(parsed, KGConfig()).materialize()


def test_classification_f1(preds):
    m = evaluate_classification(preds)
    # deterministic grammar + deterministic parser: near-perfect directed F1
    assert m["macro_f1"] >= 0.95, m["macro_f1"]
    assert m["micro_f1"] >= 0.95


def test_single_mode_duplicates(ray_session):
    tab = labeled_sentences_table(30)
    parsed = parsed_records(ray.data.from_arrow(tab))
    base = classify(parsed, KGConfig()).count()
    single = classify(parsed, KGConfig(single=True)).materialize()
    assert single.count() == 2 * base
    m = evaluate_classification(single)
    assert m["macro_f1"] >= 0.95  # reversed duplicates carry flipped labels


def test_sentence_mode(ray_session):
    """M8 --sentence mode: raw token subsequence path; the trigger verb
    lies between the entities, so F1 stays high."""
    from relation_extraction_ray.nlp.parser import parse_sentence
    from relation_extraction_ray.nlp.sdp import token_span_path

    sent = parse_sentence("The cat caused the chaos .")
    path = token_span_path(sent, 1, 4)
    assert [t[0] for t in path] == ["<X>", "caused", "the", "<Y>"]
    # reversed order swaps the placeholder roles
    rev = token_span_path(sent, 4, 1)
    assert rev[0][0] == "<Y>" and rev[-1][0] == "<X>"

    tab = labeled_sentences_table(80)
    parsed = parsed_records(ray.data.from_arrow(tab))
    preds = classify(parsed, KGConfig(sentence_mode=True)).materialize()
    m = evaluate_classification(preds)
    assert m["macro_f1"] >= 0.9, m["macro_f1"]


def test_prf_from_counts_math():
    rows = [
        {"pred": "A", "label": "A", "n": 8},
        {"pred": "A", "label": "B", "n": 2},
        {"pred": "B", "label": "B", "n": 4},
        {"pred": "Other", "label": "A", "n": 2},
    ]
    m = prf_from_counts(rows)
    a = m["per_class"]["A"]
    assert a["precision"] == 0.8 and a["recall"] == 0.8
    b = m["per_class"]["B"]
    assert b["precision"] == 1.0 and b["recall"] == pytest.approx(4 / 6)
    assert "Other" not in m["per_class"]


def test_score_triples_prf(ray_session):
    got = ray.data.from_items(
        [
            {"doc_id": "d1", "subj": "a", "pred": "R", "obj": "b"},
            {"doc_id": "d1", "subj": "a", "pred": "R", "obj": "b"},  # dup counts once
            {"doc_id": "d2", "subj": "x", "pred": "R", "obj": "y"},
        ]
    )
    gold = ray.data.from_items(
        [
            {"doc_id": "d1", "subj": "a", "pred": "R", "obj": "b"},
            {"doc_id": "d3", "subj": "m", "pred": "S", "obj": "n"},
        ]
    )
    m = score_triples(got, gold)
    assert m["tp"] == 1 and m["n_got"] == 2 and m["n_gold"] == 2
    assert m["precision"] == 0.5 and m["recall"] == 0.5
