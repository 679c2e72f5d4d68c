"""Oracle end-to-end: grammar-gold P/R, determinism, invariants."""

import pyarrow.compute as pc

from relation_extraction_ray.config import KGConfig
from relation_extraction_ray.oracle import canonical_norm, canonical_id, run_oracle
from relation_extraction_ray.sources.synth import corpus_table, gold_table, span_sequence_hash

N_DOCS = 120


def _triple_set(tab):
    return set(
        zip(
            tab.column("doc_id").to_pylist(),
            tab.column("sent_id").to_pylist(),
            tab.column("subj").to_pylist(),
            tab.column("pred").to_pylist(),
            tab.column("obj").to_pylist(),
        )
    )


def test_oracle_matches_grammar_gold():
    docs = corpus_table(N_DOCS).to_pylist()
    gold = _triple_set(gold_table(N_DOCS))
    res = run_oracle(docs)
    pred = _triple_set(res["triples"])
    tp = len(pred & gold)
    precision = tp / max(1, len(pred))
    recall = tp / max(1, len(gold))
    # north rule: P/R >= 0.95 vs the reference-equivalent eval triples
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_oracle_deterministic():
    docs = corpus_table(40).to_pylist()
    a, b = run_oracle(docs), run_oracle(docs)
    for key in ("vocab", "encoded", "triples", "entities", "adjacency"):
        assert a[key].equals(b[key]), key


def test_span_hash_invariant_carried_to_triples():
    docs = corpus_table(30).to_pylist()
    expected = {
        row["doc_id"]: span_sequence_hash(
            [s["kind"] for s in row["spans"]],
            [s["text"] for s in row["spans"]],
            [s["media_ref"] for s in row["spans"]],
        )
        for row in docs
    }
    res = run_oracle(docs)
    for t in res["triples"].to_pylist():
        assert t["span_hash"] == expected[t["doc_id"]]


def test_canonicalization_merges_variants():
    assert canonical_norm("Zorbal") == canonical_norm("zorbal") == canonical_norm("zorbals")
    assert canonical_norm("zorbal's") == "zorbal"
    assert canonical_id("zorbal") == canonical_id("zorbal")
    assert canonical_id("zorbal") != canonical_id("melvex")


def test_entities_counts_and_adjacency_dedup():
    docs = corpus_table(N_DOCS).to_pylist()
    res = run_oracle(docs)
    ents = res["entities"]
    assert ents.num_rows == len(set(ents.column("norm").to_pylist()))
    adj = res["adjacency"]
    keys = list(
        zip(
            adj.column("src_id").to_pylist(),
            adj.column("pred").to_pylist(),
            adj.column("dst_id").to_pylist(),
        )
    )
    assert len(keys) == len(set(keys))  # exact dedup
    assert keys == sorted(keys)  # sorted materialize
    assert pc.sum(adj.column("weight")).as_py() == res["triples"].num_rows


def test_audit_stream_verdicts():
    docs = corpus_table(60).to_pylist()
    res = run_oracle(docs, KGConfig(max_len=3))
    verdicts = set(res["encoded"].column("verdict").to_pylist())
    assert verdicts <= {"GOOD", "BAD"}
