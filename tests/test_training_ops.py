"""Training-side operators: splits, distributions, negative sampling,
phrase embeddings / nearest / entropy, decode, embedding init, clusters."""

from __future__ import annotations

import numpy as np
import pytest

import ray

from relation_extraction_ray.config import KGConfig
from relation_extraction_ray.functions.training import (
    cluster_pair_labels,
    decode_paths,
    distribution_to_power,
    embedding_init,
    entropy_ranked,
    max_seq_len,
    nearest_phrases,
    negative_samples,
    phrase_embeddings,
    split_train_valid,
    target_distribution,
)
from relation_extraction_ray.pipelines.kg import KGPipeline
from relation_extraction_ray.sources.synth import documents_dataset

N_DOCS = 60


@pytest.fixture(scope="module")
def enc(ray_session):
    pipe = KGPipeline(batch_size=64)
    sent = pipe.sentences(documents_dataset(N_DOCS, override_num_blocks=4)).materialize()
    vocabs = pipe.vocabs(sent)
    encoded = pipe.encoded(sent, vocabs).filter(expr="verdict == 'GOOD'").materialize()
    return encoded, vocabs


def test_split_deterministic_and_disjoint(enc):
    encoded, _ = enc
    train, valid = split_train_valid(encoded, valid_percent=0.2, seed=1)
    t1, v1 = train.count(), valid.count()
    assert t1 + v1 == encoded.count()
    assert 0 < v1 < encoded.count()
    train2, valid2 = split_train_valid(encoded, valid_percent=0.2, seed=1)
    assert valid2.count() == v1  # same seed → same split
    _, valid3 = split_train_valid(encoded, valid_percent=0.2, seed=2)
    assert valid3.count() != v1 or valid3.take_all() != valid.take_all()


def test_target_distribution_and_power(enc):
    encoded, _ = enc
    ids, dist = target_distribution(encoded)
    assert np.isclose(dist.sum(), 1.0)
    assert (np.diff(ids) > 0).all()
    p = distribution_to_power(dist, 0.75)
    assert np.isclose(p.sum(), 1.0)
    # power smoothing flattens: max prob decreases
    assert p.max() <= dist.max() + 1e-12


def test_max_seq_len(enc):
    encoded, _ = enc
    m = max_seq_len(encoded)
    lengths = [r["length"] for r in encoded.take_all()]
    assert m == max(lengths)


def test_negative_samples_deterministic(enc):
    encoded, _ = enc
    ids, dist = target_distribution(encoded)
    negs = negative_samples(encoded, ids, distribution_to_power(dist), neg_per=3, seed=9)
    rows = negs.take_all()
    assert len(rows) == 3 * encoded.count()
    by_key = {}
    for r in rows:
        by_key[(r["doc_id"], r["sent_id"], r["pair_id"], r["neg_idx"])] = tuple(r["neg_target"])
    # neg 0 is the reversed pair
    for r in encoded.take_all():
        assert by_key[(r["doc_id"], r["sent_id"], r["pair_id"], 0)] == (
            r["target_ids"][1],
            r["target_ids"][0],
        )
    # rerun → identical draws
    rows2 = negative_samples(encoded, ids, distribution_to_power(dist), neg_per=3, seed=9).take_all()
    assert {(r["doc_id"], r["sent_id"], r["pair_id"], r["neg_idx"]): tuple(r["neg_target"]) for r in rows2} == by_key


def test_negative_samples_word_corruption(enc):
    encoded, _ = enc
    ids, dist = target_distribution(encoded)
    negs = negative_samples(encoded, ids, distribution_to_power(dist), neg_per=2, seed=4, corrupt="word").take_all()
    assert len(negs) == 2 * encoded.count()
    orig = {(r["doc_id"], r["sent_id"], r["pair_id"]): r["word_ids"] for r in encoded.take_all()}
    diffs = 0
    for r in negs:
        o = orig[(r["doc_id"], r["sent_id"], r["pair_id"])]
        assert len(r["neg_word_ids"]) == len(o)
        ndiff = sum(1 for a, b in zip(o, r["neg_word_ids"]) if a != b)
        assert ndiff <= 1  # exactly one position corrupted (or same id drawn)
        diffs += ndiff
    assert diffs > 0


def test_dep_structure_whitelist_flow(enc):
    """J4 end-to-end: whitelist collected from the corpus keeps its own
    structures GOOD; an empty whitelist rejects everything."""
    from relation_extraction_ray.functions.structures import (
        collect_dep_structures,
        dep_structures_as_labels,
    )
    from relation_extraction_ray.sources.synth import documents_dataset as dd

    encoded, vocabs = enc
    structures = collect_dep_structures(encoded, min_count=1)
    assert structures
    (_, _, _), (dv, _, _), _ = vocabs
    labels = dep_structures_as_labels(structures, dv)
    pipe = KGPipeline(batch_size=64, ok_dep_structures=labels)
    sent = pipe.sentences(dd(20, override_num_blocks=2)).materialize()
    out = pipe.encoded(sent, pipe.vocabs(sent)).take_all()
    # same-corpus whitelist: every structure seen before stays GOOD-capable
    good = [r for r in out if r["verdict"] == "GOOD"]
    assert good
    pipe2 = KGPipeline(batch_size=64, ok_dep_structures={("__never__",)})
    out2 = pipe2.encoded(sent, pipe2.vocabs(sent)).take_all()
    assert all(r["verdict"] == "BAD" for r in out2)


def test_embeddings_nearest_entropy(enc):
    encoded, vocabs = enc
    emb = phrase_embeddings(encoded, vocabs).materialize()
    first = emb.take(1)[0]
    assert len(first["embedding"]) == 64
    near = nearest_phrases(emb, np.asarray(first["embedding"]), k=5).take_all()
    assert len(near) == 5
    # the query row itself must be the top hit — unless another pair has
    # the IDENTICAL embedding (sim ties at 1.0 may order either way)
    assert (near[0]["doc_id"], near[0]["sent_id"], near[0]["pair_id"]) == (
        first["doc_id"],
        first["sent_id"],
        first["pair_id"],
    ) or near[0]["sim"] >= 1.0 - 1e-6
    assert near[0]["sim"] >= near[-1]["sim"]
    ent = entropy_ranked(emb, top_n=7).take_all()
    assert len(ent) == 7
    assert all(ent[i]["entropy"] >= ent[i + 1]["entropy"] for i in range(6))


def test_decode_roundtrip(enc):
    encoded, vocabs = enc
    (wv, _, _), _, _ = vocabs
    dec = {(r["doc_id"], r["sent_id"], r["pair_id"]): r["decoded_words"] for r in decode_paths(encoded, wv).take_all()}
    for r in encoded.take_all():
        assert dec[(r["doc_id"], r["sent_id"], r["pair_id"])] == r["path_words"]


def test_embedding_init_overrides():
    vocab = ["a", "b", "c"]
    table = {"b": np.ones(4, dtype=np.float32)}
    mat = embedding_init(vocab, table, dim=4)
    assert (mat[1] == 1.0).all()
    assert not (mat[0] == mat[2]).all()
    assert (mat == embedding_init(vocab, table, dim=4)).all()  # deterministic


def test_cluster_pair_labels(enc):
    encoded, _ = enc
    labels = cluster_pair_labels(encoded, {0: 0, 1: 1}, num_clusters=4).take_all()
    assert len(labels) == encoded.count()
    assert all(0 <= r["cluster_label"] < 16 for r in labels)


def test_word2vec_binary_roundtrip(tmp_path):
    """S9: GoogleNews-format binary reader — roundtrip + vocab pruning +
    embedding_init integration."""
    from relation_extraction_ray.functions.training import (
        read_word2vec_binary,
        write_word2vec_binary,
    )

    rng = np.random.default_rng(4)
    table = {w: rng.standard_normal(8).astype(np.float32) for w in ("cat", "dog", "naïve", "mat")}
    path = str(tmp_path / "vecs.bin")
    write_word2vec_binary(path, table)

    back = read_word2vec_binary(path)
    assert set(back) == set(table)
    for w in table:
        assert (back[w] == table[w]).all()

    pruned = read_word2vec_binary(path, vocab={"cat", "mat", "missing"})
    assert set(pruned) == {"cat", "mat"}
    limited = read_word2vec_binary(path, limit=2)
    assert len(limited) == 2

    mat = embedding_init(["cat", "unknown", "mat"], back, dim=8)
    assert (mat[0] == table["cat"]).all() and (mat[2] == table["mat"]).all()
    assert not (mat[1] == table["cat"]).all()


def test_pretrain_word_vectors_deterministic_and_used_rows_move(ray_session):
    """Self-trained SGNS vectors (the S9 stand-in when no word2vec file can
    ship): deterministic across runs and block layouts; rows for tokens
    that occur in the corpus move away from their init while the result
    shape matches the vocab."""
    import numpy as np

    import ray.data as rd

    from relation_extraction_ray.config import KGConfig
    from relation_extraction_ray.functions.training import pretrain_word_vectors
    from relation_extraction_ray.pipelines.fit import build_record_vocabs
    from relation_extraction_ray.sources.semeval import labeled_sentences_table, parsed_records

    parsed = parsed_records(rd.from_arrow(labeled_sentences_table(120))).materialize()
    (wv, w2i, _), _, _ = build_record_vocabs(parsed, KGConfig())
    vecs = pretrain_word_vectors(parsed, w2i, dim=16, epochs=2)
    assert vecs.shape == (len(wv), 16)
    vecs2 = pretrain_word_vectors(parsed.repartition(6), w2i, dim=16, epochs=2)
    assert np.array_equal(vecs, vecs2)
    # the output table is not the init (training moved in-corpus rows)
    assert float(np.abs(vecs).max()) > (0.5 / 16) + 1e-6


def test_train_skipgram_sharded_deterministic_and_single_shard_quality(ray_session):
    """Parameter-averaged distributed SGNS (the wiki-scale pretrain path):
    (a) deterministic across runs AND block layouts (shard membership is
    key % n_shards, not block-dependent); (b) n_shards=1 trains on every
    pair and, like the driver-side trainer, moves in-corpus rows off init;
    (c) sharded vectors stay close in objective terms to the driver-side
    trainer on the same pairs (cosine of matched rows well above chance)."""
    import numpy as np

    import ray.data as rd

    from relation_extraction_ray.config import KGConfig
    from relation_extraction_ray.functions.training import (
        pretrain_word_vectors,
        skipgram_pairs,
        train_skipgram_sharded,
    )
    from relation_extraction_ray.pipelines.fit import build_record_vocabs
    from relation_extraction_ray.sources.semeval import labeled_sentences_table, parsed_records

    parsed = parsed_records(rd.from_arrow(labeled_sentences_table(120))).materialize()
    (wv, w2i, _), _, _ = build_record_vocabs(parsed, KGConfig())
    pairs = skipgram_pairs(parsed, w2i, window=3).materialize()

    sharded = train_skipgram_sharded(pairs, len(w2i), dim=16, epochs=2, n_shards=4)
    assert sharded.shape == (len(w2i), 16)
    sharded2 = train_skipgram_sharded(
        skipgram_pairs(parsed.repartition(6), w2i, window=3), len(w2i), dim=16, epochs=2,
        n_shards=4,
    )
    assert np.array_equal(sharded, sharded2)

    # routed through pretrain_word_vectors(n_shards=...) = same machinery
    routed = pretrain_word_vectors(parsed, w2i, dim=16, epochs=2, window=3, n_shards=4)
    assert np.array_equal(sharded, routed)

    local = pretrain_word_vectors(parsed, w2i, dim=16, epochs=2, window=3)
    # model averaging is not bit-identical to sequential SGD, but the two
    # trainers optimize the same objective over the same pairs: rows that
    # moved during training should agree directionally (mean cosine of
    # moved rows well above 0 — random 16-d vectors center on 0 with
    # sd ~ 1/4; the threshold is a >4-sigma sanity bound, not a quality
    # claim, because 120 sentences x 2 epochs is a smoke corpus)
    moved = (np.abs(local).max(axis=1) > 0.5 / 16 + 1e-6) & (
        np.abs(sharded).max(axis=1) > 0.5 / 16 + 1e-6
    )
    a, b = local[moved], sharded[moved]
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12)
    assert moved.sum() > 10
    assert float(cos.mean()) > 0.25

    one = train_skipgram_sharded(pairs, len(w2i), dim=16, epochs=2, n_shards=1)
    assert float(np.abs(one).max()) > (0.5 / 16) + 1e-6


def test_sgns_stability_cap_and_clip():
    """Round-4 divergence fix: on a small-vocab/many-pairs corpus the
    batched SGNS kernel used to overflow to NaN within one epoch (hot-row
    gradient collisions applied at stale weights — measured at vocab 461 /
    2.25M pairs, batch 1024 and 256 both NaN).  The vocab-derived batch cap
    keeps it finite with a positive pair-score contrast, while the fixture
    path (vocab >= 8*batch) is untouched and the clip backstop returns the
    SAME object when no row exceeds the cap (bit-identity of the stable
    path)."""
    import numpy as np

    from relation_extraction_ray.functions.training import (
        _clip_rows,
        _stable_batch_size,
        train_skipgram,
    )

    # cap rule: engages only below 8x batch
    assert _stable_batch_size(1024, 9192) == 1024   # SemEval fixture vocab
    assert _stable_batch_size(1024, 461) == 57
    assert _stable_batch_size(1024, 10) == 16

    # clip backstop: no-op (same object) below cap, rescales above
    g = np.full((4, 8), 0.1)
    assert _clip_rows(g) is g
    big = np.full((2, 8), 100.0)
    clipped = _clip_rows(big)
    assert np.allclose(np.linalg.norm(clipped, axis=1), 25.0)

    # Zipf-ish tiny vocab, many pairs: finite weights, positive contrast
    rng = np.random.default_rng(3)
    V, n = 50, 300_000
    probs = 1.0 / np.arange(1, V + 1) ** 0.9
    probs /= probs.sum()
    centers = rng.choice(V, size=n, p=probs).astype(np.int64)
    # contexts co-occur deterministically with their center (+1 ring)
    contexts = ((centers + 1) % V).astype(np.int64)
    w_in, w_out = train_skipgram(centers, contexts, V, dim=8, epochs=1, return_context=True)
    assert np.isfinite(w_in).all() and np.isfinite(w_out).all()
    s = slice(0, 50_000)
    obs = float((w_in[centers[s]] * w_out[contexts[s]]).sum(axis=1).mean())
    rnd = float(
        (w_in[centers[s]] * w_out[rng.permutation(contexts[s])]).sum(axis=1).mean()
    )
    assert obs - rnd > 0.1
