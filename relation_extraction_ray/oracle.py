"""Pure-Python, single-process oracle for the whole KG pipeline.

This is the engine's *reference-equivalent* implementation (SURVEY.md §5,
FIXTURES.md F3): it executes the exact extraction semantics of the
reference's two-pass builder (``wiki_and_semeval2sdp.py:319-472``) —
parse → vocab barrier → extract/encode/filter → label/score → triples →
link → canonicalize → adjacency — in plain Python over a small documents
table. Tests run the Ray pipeline and this oracle on the same corpus and
assert equality (the P/R ≥ 0.95 gate is trivially exceeded when outputs are
bit-identical; both are also scored against the generator's grammar gold).

It shares the per-sentence primitives (`nlp/`) and the scorer
(`state/scorer.py`) with the Ray stages; what it does NOT share is any of
the distributed machinery — aggregation, grouping, dedup and ordering here
are naive dicts/sorts, which is the point: two independent routes to the
same tables.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from . import schemas
from .config import KGConfig
from .nlp.labeler import LABEL2INT, LABELS, OTHER, label_path
from .nlp.parser import parse_sentence, split_sentences
from .nlp.sdp import (
    finalize_vocab,
    is_ok_sdp,
    post_process_path,
    sentence_to_sdps,
    vocab2idx,
)
from .sources.synth import span_sequence_hash
from .state.scorer import pad_paths, score_batch, weights_fixture


# The one shared normalization definition (nlp/normalize.py) — an edit
# there changes pipeline, oracle and linker together, never one alone.
from .nlp.normalize import canonical_id, canonical_norm  # noqa: E402


def doc_rows_to_sentences(doc_rows: list[dict]) -> list[dict]:
    """documents → parsed sentence records (text spans only; media spans pass
    through untouched — their identity is carried by span_hash)."""
    out = []
    for row in doc_rows:
        spans = row["spans"]
        shash = span_sequence_hash(
            [s["kind"] for s in spans], [s["text"] for s in spans], [s["media_ref"] for s in spans]
        )
        sent_id = 0
        for span_idx, span in enumerate(spans):
            if span["kind"] != "text":
                continue
            for text in split_sentences(span["text"]):
                sent = parse_sentence(text)
                out.append(
                    {
                        "doc_id": row["doc_id"],
                        "span_idx": span_idx,
                        "sent_id": sent_id,
                        "text": text,
                        "sent": sent,
                        "span_hash": shash,
                    }
                )
                sent_id += 1
    return out


def build_vocabs(
    sent_records: list[dict], cfg: KGConfig
) -> tuple[tuple[list, dict, list], tuple[list, dict, list], tuple[list, dict, list]]:
    """Two-pass barrier #1: corpus-global token/dep/pos vocabularies.

    Counts raw lowercased token text (NOT smart-normalized) exactly like
    ``create_vocab_from_data`` (``wiki2sdp.py:199-202``); dep/pos vocabs
    keep everything (``wiki2sdp.py:310-314`` calls with min_count=0).
    """
    wc: Counter = Counter()
    dc: Counter = Counter()
    pc: Counter = Counter()
    for r in sent_records:
        s = r["sent"]
        for i in range(len(s)):
            wc[s.tokens[i].lower()] += 1
            dc[s.dep[i]] += 1
            pc[s.pos[i]] += 1
    word = finalize_vocab(wc, vocab_limit=cfg.vocab_limit, min_count=cfg.min_count, oov_count=cfg.oov_count)
    dep = finalize_vocab(dc, oov_count=cfg.oov_count)
    pos = finalize_vocab(pc, oov_count=cfg.oov_count)
    return word, dep, pos


def extract_encoded(
    sent_records: list[dict],
    word_v: dict,
    dep_v: dict,
    pos_v: dict,
    cfg: KGConfig,
    ok_dep_structures: set[tuple[str, ...]] | None = None,
) -> list[dict]:
    """Pass 2: SDP extraction + encode + GOOD/BAD verdict (audit stream S5).

    Returns one record per candidate SDP, encoded, with verdict — mirroring
    the combined builder's records/outfile pair
    (``wiki_and_semeval2sdp.py:389-449``).
    """
    oov_id = word_v["<OOV>"]
    ok_ids: set[tuple[int, ...]] | None = None
    if ok_dep_structures is not None:
        ok_ids = {tuple(vocab2idx(d, dep_v) for d in structure) for structure in ok_dep_structures}
    out = []
    for r in sent_records:
        sent = r["sent"]
        for pair_id, sdp in enumerate(
            sentence_to_sdps(
                sent,
                min_len=cfg.min_len,
                max_len=cfg.max_len,
                include_ends=cfg.include_ends,
                max_pairs=cfg.max_pairs_per_sentence,
            )
        ):
            path = post_process_path(sdp["path"])
            word_ids = [vocab2idx(t[0], word_v) for t in path]
            dep_ids = [vocab2idx(t[1], dep_v) for t in path]
            pos_ids = [vocab2idx(t[2], pos_v) for t in path]
            target_ids = [vocab2idx(sdp["target"][0], word_v), vocab2idx(sdp["target"][1], word_v)]
            path_ids = list(zip(word_ids, dep_ids, pos_ids))
            good = is_ok_sdp(path_ids, target_ids, oov_id, ok_dep_structures=ok_ids, oov_percent=cfg.oov_percent)
            out.append(
                {
                    "doc_id": r["doc_id"],
                    "sent_id": r["sent_id"],
                    "pair_id": pair_id,
                    "path_words": [t[0] for t in path],
                    "word_ids": word_ids,
                    "dep_ids": dep_ids,
                    "pos_ids": pos_ids,
                    "target_ids": target_ids,
                    "length": len(path),
                    "subj": sdp["target"][0],
                    "obj": sdp["target"][1],
                    "verdict": "GOOD" if good else "BAD",
                    "span_hash": r["span_hash"],
                }
            )
    return out


def score_records(records: list[dict], word_v: dict, dep_v: dict, pos_v: dict, cfg: KGConfig) -> list[dict]:
    """Distant-supervision label + GRU confidence → triples (pred != Other)."""
    good = [r for r in records if r["verdict"] == "GOOD"]
    if not good:
        return []
    wts = weights_fixture(len(word_v), len(dep_v), len(pos_v), seed=cfg.scorer_seed)
    w, d, p, lengths = pad_paths(
        [r["word_ids"] for r in good], [r["dep_ids"] for r in good], [r["pos_ids"] for r in good]
    )
    _, probs = score_batch(wts, w, d, p, lengths)
    triples = []
    for i, r in enumerate(good):
        label = label_path(r["path_words"])
        if label == OTHER:
            continue
        triples.append(
            {
                "doc_id": r["doc_id"],
                "sent_id": r["sent_id"],
                "subj": r["subj"],
                "pred": label,
                "obj": r["obj"],
                "score": float(probs[i, LABEL2INT[label]]),
                "span_hash": r["span_hash"],
            }
        )
    return triples


def canonicalize(triples: list[dict]) -> tuple[list[dict], list[dict]]:
    """Barrier #2: entity canonicalization + graph materialize.

    entities: per normalized surface — canonical id, most frequent raw
    variant (count desc, surface asc), total mention count.
    adjacency: exact-dedup of (src_id, pred, dst_id) with weight = support
    count, distinct-doc count, min doc id sample; sorted.
    """
    variant_counts: Counter = Counter()
    for t in triples:
        variant_counts[(canonical_norm(t["subj"]), t["subj"])] += 1
        variant_counts[(canonical_norm(t["obj"]), t["obj"])] += 1
    by_norm: dict[str, list] = {}
    for (norm, surface), c in variant_counts.items():
        by_norm.setdefault(norm, []).append((surface, c))
    entities = []
    for norm in sorted(by_norm):
        variants = sorted(by_norm[norm], key=lambda sc: (-sc[1], sc[0]))
        entities.append(
            {
                "canonical_id": canonical_id(norm),
                "surface": variants[0][0],
                "norm": norm,
                "count": sum(c for _, c in variants),
            }
        )
    edges: dict[tuple[str, str, str], dict] = {}
    for t in triples:
        key = (canonical_id(canonical_norm(t["subj"])), t["pred"], canonical_id(canonical_norm(t["obj"])))
        e = edges.setdefault(key, {"weight": 0, "docs": set(), "sample": t["doc_id"]})
        e["weight"] += 1
        e["docs"].add(t["doc_id"])
        e["sample"] = min(e["sample"], t["doc_id"])
    adjacency = [
        {
            "src_id": k[0],
            "pred": k[1],
            "dst_id": k[2],
            "weight": v["weight"],
            "doc_count": len(v["docs"]),
            "sample_doc_id": v["sample"],
        }
        for k, v in sorted(edges.items())
    ]
    return entities, adjacency


def link_rows(triples_rows: list[dict]) -> list[dict]:
    """Single-process oracle for the KB-linking stage: the same
    deterministic disambiguation (``state/linker.py`` semantics) applied in
    a plain loop — no broadcast, no actor pool, no Dataset."""
    from .nlp.normalize import nil_id, surface_norm
    from .state.linker import build_kb, score_candidates, synth_kb

    kb = build_kb(synth_kb())
    out = []
    for t in triples_rows:
        rel = t["pred"].lower().split("(")[0]
        context = {t["subj"].lower(), t["obj"].lower(), rel, *rel.split("-")}

        def link(surface: str) -> tuple[str, bool]:
            norm = surface_norm(surface)
            cands = kb.get(norm)
            if not cands:
                return nil_id(norm), False
            return score_candidates(norm, context, cands)["kb_id"], True

        skb, sok = link(t["subj"])
        okb, ook = link(t["obj"])
        out.append({**t, "subj_kb": skb, "obj_kb": okb, "subj_linked": sok, "obj_linked": ook})
    return out


def media_digest_rows(n_docs: int, seed: int = 42) -> list[dict]:
    """Single-process oracle for the media feature plumbing: explode media
    spans, synthesize payloads, fake-decode, digest — plain loops over the
    deterministic corpus (matches ``stages/media.media_features`` +
    ``feature_fp`` projection)."""
    from .sources.synth import corpus_table
    from .stages.media import _fake_decode, _synth_payload, feature_fp

    rows = []
    for row in corpus_table(n_docs, seed=seed).to_pylist():
        for span_idx, s in enumerate(row["spans"]):
            if s["kind"] == "text":
                continue
            payload = _synth_payload(s["media_ref"], 4096)
            n_frames = 3 if s["kind"] == "video" else 1
            for f in range(n_frames):
                feat = _fake_decode(payload, 64, 64, f)
                rows.append(
                    {
                        "doc_id": row["doc_id"],
                        "span_idx": span_idx,
                        "kind": s["kind"],
                        "media_ref": s["media_ref"],
                        "frame_idx": f,
                        "width": 64,
                        "height": 64,
                        "backend": "fake",
                        "feat_fp": feature_fp(feat.tolist()),
                    }
                )
    return rows


def _metrics_of(preds: pa.Table) -> dict:
    from collections import Counter as _Counter

    from .eval import prf_from_counts

    counts = _Counter(zip(preds.column("pred").to_pylist(), preds.column("label").to_pylist()))
    return prf_from_counts([{"pred": p, "label": l, "n": c} for (p, l), c in counts.items()])


def supervised_metrics_row(n: int, cfg: KGConfig | None = None) -> dict:
    """Single-process oracle for the supervised eval query: generate the
    labeled records, strip tags, classify with BOTH the trigger lexicon and
    the TRAINED synth fixture (stage classes called as plain functions on
    ONE batch), count confusions with dicts, finalize P/R/F1 — no Dataset,
    no groupby."""
    from .pipelines.fit import ModelClassifyStage
    from .pipelines.supervised import ClassifyStage
    from .sources.semeval import labeled_sentences_table, parse_records_batch
    from .state.scorer import fixture_path, load_weights

    cfg = cfg or KGConfig()
    parsed = parse_records_batch(labeled_sentences_table(n))
    lex = _metrics_of(ClassifyStage(cfg)(parsed))
    model = load_weights(fixture_path("synth"))
    mod = _metrics_of(ModelClassifyStage(cfg=cfg, model=model)(parsed))
    return {
        "lexicon_macro_f1": round(lex["macro_f1"], 6),
        "lexicon_micro_f1": round(lex["micro_f1"], 6),
        "model_macro_f1": round(mod["macro_f1"], 6),
        "model_micro_f1": round(mod["micro_f1"], 6),
        "model_macro_precision": round(mod["macro_precision"], 6),
        "model_macro_recall": round(mod["macro_recall"], 6),
    }


def supervised_metrics_row_large(n: int, cfg: KGConfig | None = None) -> dict:
    """Oracle row for the ``synth_large`` fixture (trained on a 10× corpus
    via ``fit_alternating_distributed`` — the distributed NEG+supervised
    recipe): same single-process replay discipline as
    :func:`supervised_metrics_row`, model metrics only."""
    from .pipelines.fit import ModelClassifyStage
    from .sources.semeval import labeled_sentences_table, parse_records_batch
    from .state.scorer import fixture_path, load_weights

    cfg = cfg or KGConfig()
    parsed = parse_records_batch(labeled_sentences_table(n))
    model = load_weights(fixture_path("synth_large"))
    mod = _metrics_of(ModelClassifyStage(cfg=cfg, model=model)(parsed))
    return {
        "model_macro_f1": round(mod["macro_f1"], 6),
        "model_micro_f1": round(mod["micro_f1"], 6),
        "model_macro_precision": round(mod["macro_precision"], 6),
        "model_macro_recall": round(mod["macro_recall"], 6),
    }


SEMEVAL_DATA = "/root/reference/SemEval2010_task8_all_data"


def semeval_official_row(cfg: KGConfig | None = None) -> dict:
    """Single-process oracle for the REAL-SemEval official-score query: read
    the shipped test file + directional keys with plain Python, classify
    with the trained ``semeval_real`` fixture, score with the official
    scorer math (validated against the perl scorer's worked examples)."""
    from collections import Counter as _Counter

    from .eval_semeval import official_scores_from_pairs, read_key_file
    from .pipelines.fit import BiModelClassifyStage, ModelClassifyStage
    from .sources.semeval import parse_record_text, parse_records_batch
    from .state.scorer import fixture_path, is_bi_fixture, load_bi, load_weights

    cfg = cfg or KGConfig(min_count=2)
    records = pa.Table.from_pylist(
        parse_record_text(
            open(f"{SEMEVAL_DATA}/SemEval2010_task8_testing_keys/TEST_FILE_CLEAN.TXT").read()
        )
    )
    parsed = parse_records_batch(records)
    # dispatch on the fixture's architecture, exactly as model_classify_any
    # does on the distributed side — the oracle replays whichever model won
    fx = fixture_path("semeval_real")
    if is_bi_fixture(fx):
        preds = BiModelClassifyStage(cfg=cfg, model=load_bi(fx))(parsed)
    else:
        preds = ModelClassifyStage(cfg=cfg, model=load_weights(fx))(parsed)
    key = read_key_file(f"{SEMEVAL_DATA}/test_keys.txt")
    pairs = _Counter(
        (p, key[sid])
        for sid, p in zip(preds.column("sent_id").to_pylist(), preds.column("pred").to_pylist())
    )
    s = official_scores_from_pairs([(p, a, n) for (p, a), n in pairs.items()])
    return {
        "official_macro_f1": round(s["official_f1"], 6),
        "macro_p": round(s["macro_p"], 6),
        "macro_r": round(s["macro_r"], 6),
        "micro_f1": round(s["micro_f1"], 6),
        "accuracy": round(s["accuracy"], 6),
        "coverage": round(s["coverage"], 6),
        "n_test": 2717,
    }


def semeval_single_official_row(cfg: KGConfig | None = None) -> dict:
    """Single-process oracle for the dual-direction (T3 "single" mode)
    official-score query: same shipped test file + keys, classified with
    the trained ``semeval_single`` dual fixture via the average-single
    ensemble, all in one process (checks the distributed actor-pool path
    byte for byte)."""
    from collections import Counter as _Counter

    from .eval_semeval import official_scores_from_pairs, read_key_file
    from .pipelines.fit import DualModelClassifyStage
    from .sources.semeval import parse_record_text, parse_records_batch
    from .state.scorer import fixture_path, load_dual

    cfg = cfg or KGConfig(min_count=2)
    records = pa.Table.from_pylist(
        parse_record_text(
            open(f"{SEMEVAL_DATA}/SemEval2010_task8_testing_keys/TEST_FILE_CLEAN.TXT").read()
        )
    )
    parsed = parse_records_batch(records)
    model = load_dual(fixture_path("semeval_single"))
    preds = DualModelClassifyStage(cfg=cfg, model=model)(parsed)
    key = read_key_file(f"{SEMEVAL_DATA}/test_keys.txt")
    pairs = _Counter(
        (p, key[sid])
        for sid, p in zip(preds.column("sent_id").to_pylist(), preds.column("pred").to_pylist())
    )
    s = official_scores_from_pairs([(p, a, n) for (p, a), n in pairs.items()])
    return {
        "official_macro_f1": round(s["official_f1"], 6),
        "macro_p": round(s["macro_p"], 6),
        "macro_r": round(s["macro_r"], 6),
        "micro_f1": round(s["micro_f1"], 6),
        "accuracy": round(s["accuracy"], 6),
        "coverage": round(s["coverage"], 6),
        "n_test": 2717,
    }


def semeval_bi_official_row(cfg: KGConfig | None = None) -> dict:
    """Single-process oracle for the BIDIRECTIONAL-trunk official-score
    query: same shipped test file + keys, classified with the trained
    ``semeval_bi`` fixture (reference ``relembed.py:87,230-235`` — fw/bw
    GRU final states concatenated into the softmax input), all in one
    process (checks the distributed path byte for byte)."""
    from collections import Counter as _Counter

    from .eval_semeval import official_scores_from_pairs, read_key_file
    from .pipelines.fit import BiModelClassifyStage
    from .sources.semeval import parse_record_text, parse_records_batch
    from .state.scorer import fixture_path, load_bi

    cfg = cfg or KGConfig(min_count=2)
    records = pa.Table.from_pylist(
        parse_record_text(
            open(f"{SEMEVAL_DATA}/SemEval2010_task8_testing_keys/TEST_FILE_CLEAN.TXT").read()
        )
    )
    parsed = parse_records_batch(records)
    model = load_bi(fixture_path("semeval_bi"))
    preds = BiModelClassifyStage(cfg=cfg, model=model)(parsed)
    key = read_key_file(f"{SEMEVAL_DATA}/test_keys.txt")
    pairs = _Counter(
        (p, key[sid])
        for sid, p in zip(preds.column("sent_id").to_pylist(), preds.column("pred").to_pylist())
    )
    s = official_scores_from_pairs([(p, a, n) for (p, a), n in pairs.items()])
    return {
        "official_macro_f1": round(s["official_f1"], 6),
        "macro_p": round(s["macro_p"], 6),
        "macro_r": round(s["macro_r"], 6),
        "micro_f1": round(s["micro_f1"], 6),
        "accuracy": round(s["accuracy"], 6),
        "coverage": round(s["coverage"], 6),
        "n_test": 2717,
    }


def semeval_ensemble_official_row(cfg: KGConfig | None = None) -> dict:
    """Single-process oracle for the probability-averaging ENSEMBLE of the
    three committed fixtures (uni ``semeval_real`` + bi ``semeval_bi`` +
    dual ``semeval_single`` — the reference's average-ensemble idea,
    RelEmbed Average Single.ipynb, generalized across checkpoints and
    architectures): same shipped test file + keys, classified in one
    process (checks the distributed stage byte for byte)."""
    from collections import Counter as _Counter

    from .eval_semeval import official_scores_from_pairs, read_key_file
    from .pipelines.fit import EnsembleClassifyStage, load_member
    from .sources.semeval import parse_record_text, parse_records_batch
    from .state.scorer import fixture_path

    cfg = cfg or KGConfig(min_count=2)
    records = pa.Table.from_pylist(
        parse_record_text(
            open(f"{SEMEVAL_DATA}/SemEval2010_task8_testing_keys/TEST_FILE_CLEAN.TXT").read()
        )
    )
    parsed = parse_records_batch(records)
    members = [
        load_member(fixture_path("semeval_real")),
        load_member(fixture_path("semeval_bi")),
        load_member(fixture_path("semeval_single")),
    ]
    preds = EnsembleClassifyStage(cfg=cfg, models=members)(parsed)
    key = read_key_file(f"{SEMEVAL_DATA}/test_keys.txt")
    pairs = _Counter(
        (p, key[sid])
        for sid, p in zip(preds.column("sent_id").to_pylist(), preds.column("pred").to_pylist())
    )
    s = official_scores_from_pairs([(p, a, n) for (p, a), n in pairs.items()])
    return {
        "official_macro_f1": round(s["official_f1"], 6),
        "macro_p": round(s["macro_p"], 6),
        "macro_r": round(s["macro_r"], 6),
        "micro_f1": round(s["micro_f1"], 6),
        "accuracy": round(s["accuracy"], 6),
        "coverage": round(s["coverage"], 6),
        "n_test": 2717,
    }


def run_oracle(doc_rows: list[dict], cfg: KGConfig | None = None, ok_dep_structures=None) -> dict:
    """Full single-process pipeline → dict of pyarrow Tables keyed by stage."""
    cfg = cfg or KGConfig()
    sents = doc_rows_to_sentences(doc_rows)
    (wv, w2i, wdist), (dv, d2i, ddist), (pv, p2i, pdist) = build_vocabs(sents, cfg)
    records = extract_encoded(sents, w2i, d2i, p2i, cfg, ok_dep_structures)
    triples = score_records(records, w2i, d2i, p2i, cfg)
    entities, adjacency = canonicalize(triples)

    def vocab_tab(vocab, dist):
        return pa.Table.from_pydict(
            {"id": np.arange(len(vocab), dtype=np.int32), "token": vocab, "prob": dist},
            schema=schemas.VOCAB,
        )

    return {
        "sentences_n": len(sents),
        "vocab": vocab_tab(wv, wdist),
        "dep_vocab": vocab_tab(dv, ddist),
        "pos_vocab": vocab_tab(pv, pdist),
        "encoded": pa.Table.from_pylist(records, schema=schemas.ENCODED)
        if records
        else schemas.ENCODED.empty_table(),
        "triples": pa.Table.from_pylist(triples, schema=schemas.TRIPLES)
        if triples
        else schemas.TRIPLES.empty_table(),
        "entities": pa.Table.from_pylist(entities, schema=schemas.ENTITIES)
        if entities
        else schemas.ENTITIES.empty_table(),
        "adjacency": pa.Table.from_pylist(adjacency, schema=schemas.ADJACENCY)
        if adjacency
        else schemas.ADJACENCY.empty_table(),
    }


def kg_embeddings_rows(
    adjacency: pa.Table,
    walk_len: int = 4,
    window: int = 2,
    dim: int = 16,
    epochs: int = 5,
) -> list[dict]:
    """Single-process replay of the kg_embeddings query (DeepWalk entity
    vectors): plain-Python deterministic walks + window pairs over the
    ORACLE pipeline's adjacency, then the same driver SGNS
    (functions/training.train_skipgram called as a plain function — the
    supervised_metrics_row precedent of replaying with engine kernels on
    one batch) and the nearest-neighbor cosine digest.  Verifies the
    distributed walk/pair plumbing feeds the trainer bit-identical input;
    walk/pair correctness is independently SQL-proven by the
    random_walks / walk_pairs oracles."""
    import hashlib

    import numpy as np

    from .functions.training import train_skipgram

    out: dict[str, set] = {}
    for u, v in zip(
        adjacency.column("src_id").to_pylist(), adjacency.column("dst_id").to_pylist()
    ):
        out.setdefault(u, set()).add(v)
    nbrs = {u: sorted(vs) for u, vs in out.items()}
    pair_cnt: dict[tuple, int] = {}
    for s in sorted(nbrs):
        seq = [s]
        cur = s
        for t in range(1, walk_len + 1):
            ns = nbrs.get(cur)
            if not ns:
                break
            cur = ns[
                int(hashlib.md5(f"{s}|{cur}|{t}".encode()).hexdigest()[:16], 16)
                % len(ns)
            ]
            seq.append(cur)
        for i in range(len(seq)):
            for d in range(1, window + 1):
                if i + d < len(seq):
                    a, b = seq[i], seq[i + d]
                    pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
                    pair_cnt[(b, a)] = pair_cnt.get((b, a), 0) + 1
    if not pair_cnt:
        return []
    pairs = sorted(pair_cnt.items())
    nodes = sorted({a for (a, _), _ in pairs} | {b for (_, b), _ in pairs})
    n2i = {n: i for i, n in enumerate(nodes)}
    reps = np.array([n for _, n in pairs], np.int64)
    centers = np.repeat(np.array([n2i[a] for (a, _), _ in pairs], np.int64), reps)
    contexts = np.repeat(np.array([n2i[b] for (_, b), _ in pairs], np.int64), reps)
    emb = train_skipgram(centers, contexts, len(nodes), dim=dim, epochs=epochs)
    e = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    sims = e @ e.T
    np.fill_diagonal(sims, -2.0)
    nn = sims.argmax(axis=1)
    cos_micro = np.floor(sims[np.arange(len(nodes)), nn] * 1e6 + 0.5).astype(np.int64)
    return [
        {"node": n, "nn": nodes[j], "cos_micro": int(c)}
        for n, j, c in zip(nodes, nn, cos_micro)
    ]


def media_phash_rows(n_docs: int, seed: int = 42) -> list[dict]:
    """Single-process oracle for the perceptual-hash stage: explode media
    spans, synthesize payloads + fake pixels (the shared deterministic
    generators), then recompute dHash/aHash with PLAIN per-bit loops —
    an independent implementation of the bit-packing the engine does
    vectorized (``stages/media.dhash64/ahash64``)."""
    from .sources.synth import corpus_table
    from .stages.media import _LOCALITY_DOCS, _fake_pixels, _synth_payload

    rows = []
    for row in corpus_table(n_docs, seed=seed).to_pylist():
        doc_index = int(row["doc_id"][3:])
        for span_idx, s in enumerate(row["spans"]):
            if s["kind"] == "text":
                continue
            payload = _synth_payload(s["media_ref"], 4096)
            px = _fake_pixels(payload, locality=doc_index // _LOCALITY_DOCS)
            dh = 0
            for r in range(8):
                for c in range(8):
                    if int(px[r][c]) < int(px[r][c + 1]):
                        dh |= 1 << (r * 8 + c)
            total = sum(int(px[r][c]) for r in range(8) for c in range(8))
            ah = 0
            for r in range(8):
                for c in range(8):
                    if int(px[r][c]) * 64 > total:
                        ah |= 1 << (r * 8 + c)
            rows.append(
                {
                    "doc_id": row["doc_id"],
                    "span_idx": span_idx,
                    "uid": doc_index * 64 + span_idx,
                    "kind": s["kind"],
                    "media_ref": s["media_ref"],
                    "dhash": dh,
                    "ahash": ah,
                    "backend": "fake",
                }
            )
    return rows


def media_dup_pairs_rows(n_docs: int, max_hamming: int = 3, seed: int = 42) -> list[dict]:
    """Brute-force O(n²) Hamming scan over the oracle phashes — the
    completeness check for the engine's pigeonhole bucketing (which is
    exact for d ≤ k by the (k+1)-block argument)."""
    ph = media_phash_rows(n_docs, seed=seed)
    out = []
    for i in range(len(ph)):
        for j in range(i + 1, len(ph)):
            a, b = ph[i], ph[j]
            d = bin(a["dhash"] ^ b["dhash"]).count("1")
            if d <= max_hamming:
                lo, hi = sorted((a["uid"], b["uid"]))
                out.append({"doc_a": lo, "doc_b": hi, "hamming": d})
    return out


def media_keep_one_rows(n_docs: int, max_hamming: int = 3, seed: int = 42) -> list[dict]:
    """Union-find over the brute-force pairs, keep the component-min uid —
    the single-process replay of media_keep_one's components + anti-join."""
    ph = media_phash_rows(n_docs, seed=seed)
    pairs = media_dup_pairs_rows(n_docs, max_hamming, seed=seed)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p["doc_a"]), find(p["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for u in parent:
        comp.setdefault(find(u), []).append(u)
    drop = set()
    for members in comp.values():
        canon = min(members)
        drop.update(m for m in members if m != canon)
    return [r for r in ph if r["uid"] not in drop]
