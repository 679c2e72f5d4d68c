"""Trained GRU classifier: analytic gradient vs numerical differentiation,
distributed data-parallel gradient ≡ single-process gradient, and a real
fit on the synthetic labeled set that must beat the untrained fixture.

The classifier is target-aware (reference left/right target embeddings,
``relembed.py:144-170``): the softmax reads ``[h ; t_emb[x] ; t_emb[y]]``.
Both modes (with and without targets) are gradient-checked."""

from __future__ import annotations

import numpy as np
import pytest

import ray

from relation_extraction_ray.config import KGConfig
from relation_extraction_ray.state.scorer import (
    WEIGHT_FIELDS,
    fields_of,
    grad_batch,
    pad_paths,
    score_batch,
    weights_fixture,
)


def _tiny_setup(seed=3, n_targets=0):
    rng = np.random.default_rng(seed)
    vw, vd, vp = 11, 5, 6
    wts = weights_fixture(vw, vd, vp, seed=seed, n_targets=n_targets)
    for f in fields_of(wts):  # float64 for clean numerical differentiation
        setattr(wts, f, getattr(wts, f).astype(np.float64))
    b, t = 4, 5
    w = rng.integers(0, vw, (b, t)).astype(np.int32)
    d = rng.integers(0, vd, (b, t)).astype(np.int32)
    p = rng.integers(0, vp, (b, t)).astype(np.int32)
    lengths = np.array([5, 3, 1, 4], dtype=np.int32)
    labels = rng.integers(0, 19, b).astype(np.int64)
    targets = rng.integers(0, vw, (b, n_targets)).astype(np.int32) if n_targets else None
    return wts, w, d, p, lengths, labels, targets


@pytest.mark.parametrize("n_targets", [0, 2])
def test_grad_matches_numerical(n_targets):
    wts, w, d, p, lengths, labels, targets = _tiny_setup(n_targets=n_targets)
    loss0, g = grad_batch(wts, w, d, p, lengths, labels, targets=targets)
    assert loss0 > 0
    rng = np.random.default_rng(0)
    eps = 1e-6
    for f in fields_of(wts):
        arr = getattr(wts, f)
        flat = arr.reshape(-1)
        for _ in range(3):  # spot-check 3 coordinates per weight tensor
            i = int(rng.integers(0, flat.size))
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = grad_batch(wts, w, d, p, lengths, labels, targets=targets)
            flat[i] = orig - eps
            lm, _ = grad_batch(wts, w, d, p, lengths, labels, targets=targets)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            ana = g[f].reshape(-1)[i]
            assert num == pytest.approx(ana, rel=1e-4, abs=1e-7), (f, i, num, ana)


def test_padded_positions_get_no_gradient():
    wts, w, d, p, lengths, labels, _ = _tiny_setup()
    # a token id used ONLY in padding (beyond lengths) must get zero grad
    w[2, 1:] = 10  # row 2 has length 1 -> positions 1.. are padding
    used_elsewhere = (w[:, :1] == 10).any() or (w[0, :5] == 10).any() or (w[1, :3] == 10).any() or (w[3, :4] == 10).any()
    if not used_elsewhere:
        _, g = grad_batch(wts, w, d, p, lengths, labels)
        assert np.allclose(g["word_emb"][10], 0.0)


def test_target_embeddings_only_hit_used_rows():
    wts, w, d, p, lengths, labels, targets = _tiny_setup(n_targets=2)
    _, g = grad_batch(wts, w, d, p, lengths, labels, targets=targets)
    used = set(targets.ravel().tolist())
    for row in range(wts.t_emb.shape[0]):
        if row not in used:
            assert np.allclose(g["t_emb"][row], 0.0), row


@pytest.fixture(scope="module")
def synth_examples(ray_session):
    import ray.data as rd

    from relation_extraction_ray.pipelines.fit import build_record_vocabs, encode_examples
    from relation_extraction_ray.sources.semeval import labeled_sentences_table, parsed_records

    parsed = parsed_records(rd.from_arrow(labeled_sentences_table(300))).materialize()
    cfg = KGConfig()
    vocabs = build_record_vocabs(parsed, cfg)
    examples = encode_examples(parsed, vocabs, cfg).materialize()
    return parsed, vocabs, examples


def test_distributed_grad_equals_local(synth_examples):
    from relation_extraction_ray.pipelines.fit import _examples_to_arrays, distributed_grad

    parsed, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    wts = weights_fixture(len(wv), len(dv), len(pv), seed=7, n_targets=2)
    dloss, dg = distributed_grad(examples.repartition(5), wts)
    w, d, p, labels, targets = _examples_to_arrays(examples)
    ww, dd, pp, lengths = pad_paths(w, d, p)
    lloss, lg = grad_batch(wts, ww, dd, pp, lengths, labels, targets=targets)
    assert dloss == pytest.approx(lloss, rel=1e-9)
    for f in fields_of(wts):
        assert np.allclose(dg[f], lg[f], rtol=1e-7, atol=1e-10), f


def test_fit_beats_untrained_fixture(synth_examples):
    from relation_extraction_ray.eval import evaluate_classification
    from relation_extraction_ray.pipelines.fit import (
        _examples_to_arrays,
        fit_classifier,
        model_classify,
    )

    parsed, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))

    wts, losses = fit_classifier(examples, sizes, epochs=25, batch_size=64, lr=5e-3)
    assert losses[-1] < losses[0] * 0.5, losses[::5]

    # accuracy of the trained model vs the untrained random fixture
    w, d, p, labels, targets = _examples_to_arrays(examples)
    ww, dd, pp, lengths = pad_paths(w, d, p)
    pred_t, _ = score_batch(wts, ww, dd, pp, lengths, targets=targets)
    acc_trained = float((pred_t == labels).mean())
    pred_u, _ = score_batch(
        weights_fixture(*sizes, seed=7, n_targets=2), ww, dd, pp, lengths, targets=targets
    )
    acc_untrained = float((pred_u == labels).mean())
    assert acc_trained > max(0.5, acc_untrained + 0.3), (acc_trained, acc_untrained)

    # the distributed prediction stage agrees and scores well end-to-end
    preds = model_classify(parsed, wts, (wv, dv, pv))
    m = evaluate_classification(preds)
    assert m["macro_f1"] > 0.5, m["macro_f1"]


def test_pathonly_fit_still_works(synth_examples):
    """``use_targets=False`` (the clustered variant's mode) keeps the
    round-1 path-only model trainable."""
    from relation_extraction_ray.pipelines.fit import fit_classifier

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    wts, losses = fit_classifier(
        examples, (len(wv), len(dv), len(pv)), epochs=6, batch_size=64, lr=5e-3,
        use_targets=False,
    )
    assert wts.t_emb is None
    assert losses[-1] < losses[0]


def test_unsup_grad_matches_numerical():
    """NEG objective (reference partial_unsup_fit, relembed.py:650-671):
    analytic gradient of the bilinear-diagonal sigmoid loss vs numerical
    differentiation over trunk AND left/right target tables."""
    from relation_extraction_ray.state.scorer import (
        UNSUP_FIELDS,
        unsup_fixture,
        unsup_grad_batch,
    )

    wts, w, d, p, lengths, _labels, _ = _tiny_setup()
    rng = np.random.default_rng(5)
    vw = wts.word_emb.shape[0]
    unsup = {f: a.astype(np.float64) for f, a in unsup_fixture(vw, seed=5).items()}
    x_ids = rng.integers(0, vw, 4).astype(np.int32)
    y_ids = rng.integers(0, vw, 4).astype(np.int32)
    labs = np.array([1, 0, 0, 1], dtype=np.int64)
    loss0, g = unsup_grad_batch(wts, unsup, w, d, p, lengths, x_ids, y_ids, labs)
    assert loss0 > 0
    eps = 1e-6
    trunk = [f for f in g if f not in UNSUP_FIELDS]
    for f in trunk + UNSUP_FIELDS:
        arr = unsup[f] if f in UNSUP_FIELDS else getattr(wts, f)
        flat = arr.reshape(-1)
        for _ in range(3):
            i = int(rng.integers(0, flat.size))
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = unsup_grad_batch(wts, unsup, w, d, p, lengths, x_ids, y_ids, labs)
            flat[i] = orig - eps
            lm, _ = unsup_grad_batch(wts, unsup, w, d, p, lengths, x_ids, y_ids, labs)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            ana = g[f].reshape(-1)[i]
            assert num == pytest.approx(ana, rel=1e-4, abs=1e-7), (f, i, num, ana)


def test_alternating_fit_learns_both_objectives(synth_examples):
    """Alternating unsup+sup cycles must reduce BOTH losses and produce a
    deterministic, usable classifier."""
    from relation_extraction_ray.pipelines.fit import fit_alternating, unsup_pairs

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))

    # negatives: 1 positive + neg_per corrupted per example, reversed first
    uw, _, _, ux, uy, ulab = unsup_pairs(examples, neg_per=3, seed=7)
    n_ex = examples.count()
    assert len(ulab) == 4 * n_ex
    assert ulab.sum() == n_ex

    wts, losses = fit_alternating(
        examples, sizes, cycles=2, unsup_epochs=2, sup_epochs=5, batch_size=64, lr=5e-3
    )
    assert losses["unsup"][-1] < losses["unsup"][0]
    assert losses["sup"][-1] < losses["sup"][0] * 0.7
    # determinism
    wts2, _ = fit_alternating(
        examples, sizes, cycles=1, unsup_epochs=1, sup_epochs=1, batch_size=64, lr=5e-3
    )
    wts3, _ = fit_alternating(
        examples, sizes, cycles=1, unsup_epochs=1, sup_epochs=1, batch_size=64, lr=5e-3
    )
    from relation_extraction_ray.state.scorer import fields_of

    for f in fields_of(wts2):
        assert np.array_equal(getattr(wts2, f), getattr(wts3, f)), f


def test_weights_roundtrip_with_targets(tmp_path, synth_examples):
    from relation_extraction_ray.state.scorer import load_weights, save_weights

    _, vocabs, _ = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    wts = weights_fixture(len(wv), len(dv), len(pv), seed=7, n_targets=2)
    path = str(tmp_path / "wts.npz")
    save_weights(wts, path, (wv, dv, pv))
    loaded, (wv2, dv2, pv2) = load_weights(path)
    assert loaded.t_emb is not None and np.array_equal(loaded.t_emb, wts.t_emb)
    assert loaded.n_targets == 2
    assert wv2 == wv and dv2 == dv and pv2 == pv

def test_distributed_fit_descends_and_deterministic(synth_examples):
    """fit_classifier_distributed: the data-parallel Adam loop (weights
    broadcast per step, per-block gradient partials, driver reduce) must
    reduce the loss and be bit-deterministic across runs."""
    from relation_extraction_ray.pipelines.fit import fit_classifier_distributed
    from relation_extraction_ray.state.scorer import fields_of

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    wts, losses = fit_classifier_distributed(
        examples, sizes, epochs=4, steps_per_epoch=3, lr=1e-2
    )
    assert losses[-1] < losses[0]
    wts2, _ = fit_classifier_distributed(
        examples, sizes, epochs=2, steps_per_epoch=3, lr=1e-2
    )
    wts3, _ = fit_classifier_distributed(
        examples, sizes, epochs=2, steps_per_epoch=3, lr=1e-2
    )
    for f in fields_of(wts2):
        assert np.array_equal(getattr(wts2, f), getattr(wts3, f)), f


def test_distributed_fit_single_step_equals_local_fullbatch(synth_examples):
    """One distributed Adam step (steps_per_epoch=1) must equal the local
    full-batch step computed with grad_batch + the same Adam math."""
    from relation_extraction_ray.pipelines.fit import (
        _examples_to_arrays,
        fit_classifier_distributed,
        pad_paths,
    )
    from relation_extraction_ray.state.scorer import (
        fields_of,
        grad_batch,
        weights_fixture,
    )

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    got, _ = fit_classifier_distributed(examples, sizes, epochs=1, steps_per_epoch=1, lr=1e-2)

    wts = weights_fixture(*sizes, seed=7, n_targets=2)
    w_all, d_all, p_all, labels, targets = _examples_to_arrays(examples)
    w, d, p, lengths = pad_paths(w_all, d_all, p_all)
    _, g = grad_batch(wts, w, d, p, lengths, labels, targets=targets)
    b1, b2, eps = 0.9, 0.999, 1e-8
    for f in fields_of(wts):
        m = (1 - b1) * g[f]
        v = (1 - b2) * g[f] * g[f]
        mh = m / (1 - b1)
        vh = v / (1 - b2)
        upd = getattr(wts, f).astype(np.float64) - 1e-2 * mh / (np.sqrt(vh) + eps)
        setattr(wts, f, upd.astype(np.float32))
    for f in fields_of(wts):
        assert np.allclose(getattr(got, f), getattr(wts, f), atol=1e-6), f


def test_active_learning_entropy_beats_seed_and_is_deterministic(synth_examples):
    """Active learning (reference notebook cells 55/57): entropy-ranked
    acquisition grows the labeled set as specified, improves eval accuracy
    over the seed-only model, beats the seeded-random control arm at equal
    budget, and is deterministic."""
    from relation_extraction_ray.pipelines.fit import active_learning_rounds

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    wts, hist = active_learning_rounds(
        examples, sizes, rounds=4, seed_count=30, acquire=50, epochs=40, lr=5e-3
    )
    assert hist["labeled"] == [30, 80, 130, 180]
    assert hist["eval_acc"][-1] >= hist["eval_acc"][0]
    assert hist["eval_acc"][-1] > 0.9
    _, rnd = active_learning_rounds(
        examples, sizes, rounds=4, seed_count=30, acquire=50, epochs=40, lr=5e-3,
        strategy="random",
    )
    assert rnd["labeled"] == hist["labeled"]
    assert hist["eval_acc"][-1] >= rnd["eval_acc"][-1]
    # determinism: a shorter rerun reproduces the prefix exactly
    _, hist2 = active_learning_rounds(
        examples, sizes, rounds=2, seed_count=30, acquire=50, epochs=40, lr=5e-3
    )
    assert hist2["eval_acc"] == hist["eval_acc"][:2]


def test_fit_keep_best_valid(synth_examples):
    """valid_mod > 0 holds out a deterministic split and returns the
    best-valid epoch snapshot (reference saves on best valid,
    relembed.py:745-753) — deterministic and still a working classifier."""
    from relation_extraction_ray.pipelines.fit import fit_classifier
    from relation_extraction_ray.state.scorer import fields_of

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    wts, losses = fit_classifier(examples, sizes, epochs=12, lr=5e-3, valid_mod=5)
    assert losses[-1] < losses[0]
    wts2, _ = fit_classifier(examples, sizes, epochs=12, lr=5e-3, valid_mod=5)
    for f in fields_of(wts):
        assert np.array_equal(getattr(wts, f), getattr(wts2, f)), f
    # and differs from the no-validation run (held-out rows removed)
    plain, _ = fit_classifier(examples, sizes, epochs=12, lr=5e-3)
    assert any(
        not np.array_equal(getattr(wts, f), getattr(plain, f)) for f in fields_of(wts)
    )


# ---------------------------------------------------------------------------
# Round 3: embedding-init hooks (S9→T5 wiring), distributed NEG/alternating,
# wall-clock checkpoint/resume.
# ---------------------------------------------------------------------------


def test_embedding_init_changes_epoch0_loss_and_is_deterministic(synth_examples):
    """init-from-table must actually enter the fit (epoch-0 loss changes)
    and stay deterministic (two initialized runs -> bit-equal weights)."""
    from relation_extraction_ray.functions.training import embedding_init
    from relation_extraction_ray.pipelines.fit import fit_classifier
    from relation_extraction_ray.state.scorer import D_TARGET, D_WORD

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    table = {tok: np.full(D_WORD, 0.05 * (i % 7 - 3), dtype=np.float32) for i, tok in enumerate(wv)}
    init_w = embedding_init(wv, table, D_WORD)
    init_t = embedding_init(wv, table, D_TARGET, seed=11)

    base_wts, base_losses = fit_classifier(examples, sizes, epochs=1)
    init_wts, init_losses = fit_classifier(
        examples, sizes, epochs=1, init_word_emb=init_w, init_t_emb=init_t
    )
    assert init_losses[0] != base_losses[0]
    again, _ = fit_classifier(examples, sizes, epochs=1, init_word_emb=init_w, init_t_emb=init_t)
    for f in fields_of(init_wts):
        assert np.array_equal(getattr(init_wts, f), getattr(again, f)), f

    with pytest.raises(ValueError):
        fit_classifier(examples, sizes, epochs=1, init_word_emb=init_w[:, :3])


def test_unsup_pairs_ds_matches_driver(synth_examples):
    """Distributed NEG-pair generation must produce the exact same pairs as
    the driver-side generator (same per-(sent_id, k) corruption keys)."""
    from relation_extraction_ray.pipelines.fit import unsup_pair_stats, unsup_pairs, unsup_pairs_ds

    _, _, examples = synth_examples
    w_all, d_all, p_all, xs, ys, labs = unsup_pairs(examples, neg_per=5, seed=42)
    rows = sorted(unsup_pairs_ds(examples.repartition(5), neg_per=5, seed=42).take_all(),
                  key=lambda r: r["uid"])
    assert len(rows) == len(labs)
    assert [r["x_id"] for r in rows] == xs.tolist()
    assert [r["y_id"] for r in rows] == ys.tolist()
    assert [r["label01"] for r in rows] == labs.tolist()
    assert [r["word_ids"] for r in rows] == w_all

    # the distributed stats equal what the driver derives
    ids_arr, cdf, n = unsup_pair_stats(examples.repartition(7))
    drv = sorted({int(x) for x in xs[labs == 1]} | {int(y) for y in ys[labs == 1]})
    assert ids_arr.tolist() == drv
    assert n == int((labs == 1).sum())


def test_alternating_distributed_single_step_equals_local(synth_examples):
    """steps_per_epoch=1 distributed alternating fit == the local loop run
    full-batch (cycles=1, 1 unsup + 1 sup epoch): same Adam sequencing."""
    from relation_extraction_ray.pipelines.fit import fit_alternating, fit_alternating_distributed

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    kw = dict(cycles=1, unsup_epochs=1, sup_epochs=1, neg_per=3, lr=1e-2, seed=7)
    local_wts, local_losses = fit_alternating(examples, sizes, batch_size=10**9, **kw)
    dist_wts, dist_losses = fit_alternating_distributed(
        examples.repartition(4), sizes, steps_per_epoch=1, **kw
    )
    assert dist_losses["unsup"][0] == pytest.approx(local_losses["unsup"][0], rel=1e-9)
    assert dist_losses["sup"][0] == pytest.approx(local_losses["sup"][0], rel=1e-6)
    for f in fields_of(local_wts):
        assert np.allclose(getattr(dist_wts, f), getattr(local_wts, f), atol=1e-6), f


def test_alternating_distributed_descends_and_deterministic(synth_examples):
    from relation_extraction_ray.pipelines.fit import fit_alternating_distributed

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    wts, losses = fit_alternating_distributed(
        examples, sizes, cycles=2, unsup_epochs=2, sup_epochs=2, steps_per_epoch=2, lr=1e-2
    )
    assert losses["unsup"][-1] < losses["unsup"][0]
    assert losses["sup"][-1] < losses["sup"][0]
    wts2, _ = fit_alternating_distributed(
        examples, sizes, cycles=2, unsup_epochs=2, sup_epochs=2, steps_per_epoch=2, lr=1e-2
    )
    for f in fields_of(wts):
        assert np.array_equal(getattr(wts, f), getattr(wts2, f)), f


def test_distributed_fit_checkpoint_kill_and_resume(tmp_path, synth_examples, monkeypatch):
    """Kill the distributed fit mid-run; a rerun with the same
    checkpoint_path must resume from the last snapshot and land on
    bit-identical final weights (reference save_interval semantics,
    relembed.py:745-753)."""
    import relation_extraction_ray.pipelines.fit as fit_mod

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    ref_wts, ref_losses = fit_mod.fit_classifier_distributed(
        examples, sizes, epochs=3, steps_per_epoch=2, lr=1e-2
    )

    ck = str(tmp_path / "fit.ck.npz")
    real_grad = fit_mod.distributed_grad
    calls = {"n": 0}

    def dying_grad(*a, **k):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("simulated crash")
        return real_grad(*a, **k)

    monkeypatch.setattr(fit_mod, "distributed_grad", dying_grad)
    with pytest.raises(RuntimeError):
        fit_mod.fit_classifier_distributed(
            examples, sizes, epochs=3, steps_per_epoch=2, lr=1e-2,
            checkpoint_path=ck, checkpoint_every_s=0.0,
        )
    monkeypatch.setattr(fit_mod, "distributed_grad", real_grad)
    got_wts, got_losses = fit_mod.fit_classifier_distributed(
        examples, sizes, epochs=3, steps_per_epoch=2, lr=1e-2,
        checkpoint_path=ck, checkpoint_every_s=0.0,
    )
    assert got_losses == ref_losses
    for f in fields_of(ref_wts):
        assert np.array_equal(getattr(got_wts, f), getattr(ref_wts, f)), f


def test_alternating_distributed_checkpoint_resume(tmp_path, synth_examples, monkeypatch):
    import relation_extraction_ray.pipelines.fit as fit_mod

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    kw = dict(cycles=1, unsup_epochs=1, sup_epochs=2, neg_per=2, steps_per_epoch=1, lr=1e-2)
    ref_wts, ref_losses = fit_mod.fit_alternating_distributed(examples, sizes, **kw)

    ck = str(tmp_path / "alt.ck.npz")
    real_grad = fit_mod.distributed_grad
    calls = {"n": 0}

    def dying_grad(*a, **k):  # sup phase runs after 1 unsup step: die on 2nd sup step
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("simulated crash")
        return real_grad(*a, **k)

    monkeypatch.setattr(fit_mod, "distributed_grad", dying_grad)
    with pytest.raises(RuntimeError):
        fit_mod.fit_alternating_distributed(
            examples, sizes, checkpoint_path=ck, checkpoint_every_s=0.0, **kw
        )
    monkeypatch.setattr(fit_mod, "distributed_grad", real_grad)
    got_wts, got_losses = fit_mod.fit_alternating_distributed(
        examples, sizes, checkpoint_path=ck, checkpoint_every_s=0.0, **kw
    )
    assert got_losses == ref_losses
    for f in fields_of(ref_wts):
        assert np.array_equal(getattr(got_wts, f), getattr(ref_wts, f)), f


def test_grad_matches_numerical_nondefault_dims():
    """The scorer is shape-generic (dims derive from the weight bundle,
    never module constants) — gradient-check a model with non-default
    word/hidden/target dims, the config path the reference's 300-d
    word2vec / 100-d GRU uses."""
    rng = np.random.default_rng(5)
    vw, vd, vp = 11, 5, 6
    wts = weights_fixture(vw, vd, vp, seed=5, n_targets=2, d_word=10, d_hidden=12, d_target=6)
    assert wts.word_emb.shape == (vw, 10) and wts.u_z.shape == (12, 12)
    assert wts.t_emb.shape == (vw, 6) and wts.w_out.shape[0] == 12 + 2 * 6
    for f in fields_of(wts):
        setattr(wts, f, getattr(wts, f).astype(np.float64))
    b, t = 4, 5
    w = rng.integers(0, vw, (b, t)).astype(np.int32)
    d = rng.integers(0, vd, (b, t)).astype(np.int32)
    p = rng.integers(0, vp, (b, t)).astype(np.int32)
    lengths = np.array([5, 3, 1, 4], dtype=np.int32)
    labels = rng.integers(0, 19, b).astype(np.int64)
    targets = rng.integers(0, vw, (b, 2)).astype(np.int32)
    loss0, g = grad_batch(wts, w, d, p, lengths, labels, targets=targets)
    assert loss0 > 0
    eps = 1e-6
    for f in fields_of(wts):
        flat = getattr(wts, f).reshape(-1)
        for _ in range(2):
            i = int(rng.integers(0, flat.size))
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = grad_batch(wts, w, d, p, lengths, labels, targets=targets)
            flat[i] = orig - eps
            lm, _ = grad_batch(wts, w, d, p, lengths, labels, targets=targets)
            flat[i] = orig
            assert (lp - lm) / (2 * eps) == pytest.approx(g[f].reshape(-1)[i], rel=1e-4, abs=1e-7), f
    # prediction path uses the same derived dims
    pred, probs = score_batch(
        wts, w, d, p, lengths, targets=targets
    )
    assert probs.shape == (b, 19)


def test_checkpoint_tag_invalidates_on_init_change(tmp_path, synth_examples):
    """A resume whose embedding init differs from the crashed run's must
    start FRESH (the tag fingerprints the init matrices), never silently
    adopt the old optimizer state."""
    from relation_extraction_ray.pipelines.fit import fit_classifier_distributed

    _, vocabs, examples = synth_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    ck = str(tmp_path / "tag.ck.npz")
    kw = dict(epochs=1, steps_per_epoch=1, lr=1e-2, checkpoint_path=ck, checkpoint_every_s=0.0)
    fit_classifier_distributed(examples, sizes, **kw)  # leaves a no-init snapshot

    from relation_extraction_ray.state.scorer import D_WORD

    init_w = np.full((len(wv), D_WORD), 0.05, dtype=np.float32)
    with_init, _ = fit_classifier_distributed(examples, sizes, init_word_emb=init_w, **kw)
    fresh, _ = fit_classifier_distributed(examples, sizes, init_word_emb=init_w,
                                          epochs=1, steps_per_epoch=1, lr=1e-2)
    for f in fields_of(fresh):
        assert np.array_equal(getattr(with_init, f), getattr(fresh, f)), f


# ---------------------------------------------------------------------------
# Bidirectional GRU trunk (reference relembed.py:87,230-235 — the bi model)
# ---------------------------------------------------------------------------


def _tiny_bi_setup(seed=3, n_targets=0, dims=None):
    from relation_extraction_ray.state.scorer import bi_fields_of, bi_fixture

    rng = np.random.default_rng(seed)
    vw, vd, vp = 11, 5, 6
    params = bi_fixture(vw, vd, vp, seed=seed, n_targets=n_targets, **(dims or {}))
    for f in bi_fields_of(params):  # float64 for clean numerical differentiation
        params[f] = params[f].astype(np.float64)
    b, t = 4, 5
    w = rng.integers(0, vw, (b, t)).astype(np.int32)
    d = rng.integers(0, vd, (b, t)).astype(np.int32)
    p = rng.integers(0, vp, (b, t)).astype(np.int32)
    lengths = np.array([5, 3, 1, 4], dtype=np.int32)
    labels = rng.integers(0, 19, b).astype(np.int64)
    targets = rng.integers(0, vw, (b, n_targets)).astype(np.int32) if n_targets else None
    return params, w, d, p, lengths, labels, targets


def test_reverse_padded_reverses_only_valid_prefix():
    from relation_extraction_ray.state.scorer import reverse_padded

    a = np.array([[1, 2, 3, 9, 9], [4, 5, 9, 9, 9]], dtype=np.int32)
    lengths = np.array([3, 2], dtype=np.int32)
    (r,) = reverse_padded([a], lengths)
    assert r[0].tolist() == [3, 2, 1, 9, 9]
    assert r[1].tolist() == [5, 4, 9, 9, 9]


@pytest.mark.parametrize(
    "n_targets,dims",
    [(0, None), (2, None), (2, {"d_word": 12, "d_hidden": 10, "d_target": 6})],
)
def test_bi_grad_matches_numerical(n_targets, dims):
    from relation_extraction_ray.state.scorer import bi_fields_of, grad_batch_bi

    params, w, d, p, lengths, labels, targets = _tiny_bi_setup(n_targets=n_targets, dims=dims)
    loss0, g = grad_batch_bi(params, w, d, p, lengths, labels, targets=targets)
    assert loss0 > 0
    rng = np.random.default_rng(0)
    eps = 1e-6
    for f in bi_fields_of(params):
        flat = params[f].reshape(-1)
        for _ in range(3):
            i = int(rng.integers(0, flat.size))
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = grad_batch_bi(params, w, d, p, lengths, labels, targets=targets)
            flat[i] = orig - eps
            lm, _ = grad_batch_bi(params, w, d, p, lengths, labels, targets=targets)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            ana = g[f].reshape(-1)[i]
            assert num == pytest.approx(ana, rel=1e-4, abs=1e-7), (f, i, num, ana)


def test_bi_unsup_grad_matches_numerical():
    from relation_extraction_ray.state.scorer import (
        UNSUP_FIELDS,
        unsup_fixture,
        unsup_grad_batch_bi,
    )

    params, w, d, p, lengths, _, _ = _tiny_bi_setup()
    d_hidden = params["fw_u_z"].shape[0]
    unsup = unsup_fixture(11, seed=3, d_hidden=2 * d_hidden)
    unsup = {f: unsup[f].astype(np.float64) for f in UNSUP_FIELDS}
    rng = np.random.default_rng(1)
    xs = rng.integers(0, 11, 4).astype(np.int32)
    ys = rng.integers(0, 11, 4).astype(np.int32)
    labs = np.array([1, 0, 0, 1], dtype=np.int64)
    loss0, g = unsup_grad_batch_bi(params, unsup, w, d, p, lengths, xs, ys, labs)
    assert loss0 > 0
    eps = 1e-6
    for name, arr in [("fw_w_h", params["fw_w_h"]), ("bw_u_r", params["bw_u_r"]),
                      ("word_emb", params["word_emb"]),
                      ("left_emb", unsup["left_emb"]), ("right_emb", unsup["right_emb"])]:
        flat = arr.reshape(-1)
        for _ in range(3):
            i = int(rng.integers(0, flat.size))
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = unsup_grad_batch_bi(params, unsup, w, d, p, lengths, xs, ys, labs)
            flat[i] = orig - eps
            lm, _ = unsup_grad_batch_bi(params, unsup, w, d, p, lengths, xs, ys, labs)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            ana = g[name].reshape(-1)[i]
            assert num == pytest.approx(ana, rel=1e-4, abs=1e-7), (name, i, num, ana)


def test_bi_score_matches_grad_forward():
    """score_batch_bi (float32 path) and grad_batch_bi (float64 path) agree
    on the predicted argmax for a non-degenerate batch."""
    from relation_extraction_ray.state.scorer import grad_batch_bi, score_batch_bi

    params, w, d, p, lengths, labels, targets = _tiny_bi_setup(n_targets=2)
    preds, probs = score_batch_bi(params, w, d, p, lengths, targets=targets)
    assert probs.shape == (4, 19)
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    # loss from grad path at the predicted labels must match -log prob
    loss, _ = grad_batch_bi(params, w, d, p, lengths, preds.astype(np.int64), targets=targets)
    assert loss == pytest.approx(float(-np.log(probs[np.arange(4), preds]).mean()), abs=1e-4)


def test_ensemble_of_model_with_itself_equals_single(ray_session):
    """Averaging identical probability vectors changes nothing: the
    ensemble stage over [fixture, fixture] must predict exactly what the
    single-model stage predicts — catches any divergence in the shared
    featurize/encode path."""
    import pyarrow as pa

    from relation_extraction_ray.config import KGConfig
    from relation_extraction_ray.oracle import SEMEVAL_DATA
    from relation_extraction_ray.pipelines.fit import (
        EnsembleClassifyStage,
        ModelClassifyStage,
        load_member,
    )
    from relation_extraction_ray.sources.semeval import parse_record_text, parse_records_batch
    from relation_extraction_ray.state.scorer import fixture_path, load_weights

    cfg = KGConfig(min_count=2)
    records = pa.Table.from_pylist(
        parse_record_text(
            open(f"{SEMEVAL_DATA}/SemEval2010_task8_training/TRAIN_FILE.TXT").read()
        )[:200]
    )
    parsed = parse_records_batch(records)
    fx = fixture_path("semeval_real")
    single = ModelClassifyStage(cfg=cfg, model=load_weights(fx))(parsed)
    ens = EnsembleClassifyStage(cfg=cfg, models=[load_member(fx), load_member(fx)])(parsed)
    assert single.column("pred").to_pylist() == ens.column("pred").to_pylist()
    assert single.column("sent_id").to_pylist() == ens.column("sent_id").to_pylist()


def test_ensemble_distributed_equals_inprocess(ray_session):
    """The actor/task ensemble stage must match the in-process stage
    byte for byte on the mixed uni+bi member list (the committed pair)."""
    import pyarrow as pa

    from relation_extraction_ray.config import KGConfig
    from relation_extraction_ray.oracle import SEMEVAL_DATA
    from relation_extraction_ray.pipelines.fit import (
        EnsembleClassifyStage,
        ensemble_classify,
        load_member,
    )
    from relation_extraction_ray.sources.semeval import (
        parse_record_text,
        parse_records_batch,
        parsed_records,
        read_semeval_records,
    )
    from relation_extraction_ray.state.scorer import fixture_path

    cfg = KGConfig(min_count=2)
    test_file = f"{SEMEVAL_DATA}/SemEval2010_task8_testing_keys/TEST_FILE_CLEAN.TXT"
    fixtures = [fixture_path("semeval_real"), fixture_path("semeval_bi")]

    dist = ensemble_classify(parsed_records(read_semeval_records(test_file)), fixtures, cfg)
    dist_preds = {r["sent_id"]: r["pred"] for r in dist.take_all()}

    records = pa.Table.from_pylist(parse_record_text(open(test_file).read()))
    local = EnsembleClassifyStage(cfg=cfg, models=[load_member(f) for f in fixtures])(
        parse_records_batch(records)
    )
    local_preds = dict(
        zip(local.column("sent_id").to_pylist(), local.column("pred").to_pylist())
    )
    assert dist_preds == local_preds
    assert len(dist_preds) == 2717


def test_ensemble_dual_member_equals_dual_stage(ray_session):
    """A single dual-architecture member must reproduce
    DualModelClassifyStage's average-single semantics exactly."""
    import pyarrow as pa

    from relation_extraction_ray.config import KGConfig
    from relation_extraction_ray.oracle import SEMEVAL_DATA
    from relation_extraction_ray.pipelines.fit import (
        DualModelClassifyStage,
        EnsembleClassifyStage,
        load_member,
    )
    from relation_extraction_ray.sources.semeval import parse_record_text, parse_records_batch
    from relation_extraction_ray.state.scorer import fixture_path, load_dual

    cfg = KGConfig(min_count=2)
    records = pa.Table.from_pylist(
        parse_record_text(
            open(f"{SEMEVAL_DATA}/SemEval2010_task8_testing_keys/TEST_FILE_CLEAN.TXT").read()
        )[:300]
    )
    parsed = parse_records_batch(records)
    fx = fixture_path("semeval_single")
    member = load_member(fx)
    assert member[0] == "dual"
    dual = DualModelClassifyStage(cfg=cfg, model=load_dual(fx))(parsed)
    ens = EnsembleClassifyStage(cfg=cfg, models=[member])(parsed)
    assert dual.column("pred").to_pylist() == ens.column("pred").to_pylist()
