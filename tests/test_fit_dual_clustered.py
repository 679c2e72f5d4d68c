"""T3 dual-direction model (relembed_single.py semantics) and T4
clustered-softmax head (relembed_clustered.py:85,257-292): gradient
correctness, per-row direction dispatch, and real fits that must learn."""

from __future__ import annotations

import numpy as np
import pytest

import ray

from relation_extraction_ray.config import KGConfig
from relation_extraction_ray.state.scorer import (
    DUAL_FIELDS,
    EMB_FIELDS,
    GRU_FIELDS,
    dual_fields_of,
    dual_fixture,
    dual_view,
    grad_batch_dual,
    pad_paths,
    score_batch,
    score_batch_dual,
    weights_fixture,
)


def _tiny_dual(seed=3, n_out=19, n_targets=0):
    rng = np.random.default_rng(seed)
    vw, vd, vp = 11, 5, 6
    params = {
        f: a.astype(np.float64)
        for f, a in dual_fixture(vw, vd, vp, seed=seed, n_out=n_out, n_targets=n_targets).items()
    }
    b, t = 6, 5
    w = rng.integers(0, vw, (b, t)).astype(np.int32)
    d = rng.integers(0, vd, (b, t)).astype(np.int32)
    p = rng.integers(0, vp, (b, t)).astype(np.int32)
    lengths = np.array([5, 3, 1, 4, 2, 5], dtype=np.int32)
    labels = rng.integers(0, n_out, b).astype(np.int64)
    flags = np.array([True, False, True, False, False, True])
    targets = rng.integers(0, vw, (b, n_targets)).astype(np.int32) if n_targets else None
    return params, w, d, p, lengths, labels, flags, targets


@pytest.mark.parametrize("n_targets", [0, 1])
def test_dual_grad_matches_numerical(n_targets):
    params, w, d, p, lengths, labels, flags, targets = _tiny_dual(n_targets=n_targets)
    loss0, g = grad_batch_dual(params, w, d, p, lengths, labels, flags, targets=targets)
    assert loss0 > 0
    rng = np.random.default_rng(0)
    eps = 1e-6
    for f in dual_fields_of(params):
        flat = params[f].reshape(-1)
        for _ in range(2):
            i = int(rng.integers(0, flat.size))
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = grad_batch_dual(params, w, d, p, lengths, labels, flags, targets=targets)
            flat[i] = orig - eps
            lm, _ = grad_batch_dual(params, w, d, p, lengths, labels, flags, targets=targets)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            ana = g[f].reshape(-1)[i]
            assert num == pytest.approx(ana, rel=1e-4, abs=1e-7), (f, i, num, ana)


def test_dual_dispatch_selects_per_row_direction():
    params, w, d, p, lengths, labels, flags, _ = _tiny_dual()
    params32 = {f: a.astype(np.float32) for f, a in params.items()}
    preds, probs = score_batch_dual(params32, w, d, p, lengths, flags)
    pf, prf = score_batch(dual_view(params32, "fwd"), w, d, p, lengths)
    pb, prb = score_batch(dual_view(params32, "bwd"), w, d, p, lengths)
    # the two direction stacks genuinely differ (symmetry broken at init)
    assert not np.allclose(prf, prb)
    for i, fl in enumerate(flags):
        ref_probs = prf[i] if fl else prb[i]
        ref_pred = pf[i] if fl else pb[i]
        assert np.allclose(probs[i], ref_probs)
        assert preds[i] == ref_pred


def test_dual_shared_embeddings_get_both_directions_gradient():
    params, w, d, p, lengths, labels, flags, _ = _tiny_dual()
    _, g_mixed = grad_batch_dual(params, w, d, p, lengths, labels, flags)
    _, g_fwd = grad_batch_dual(params, w, d, p, lengths, labels, np.ones_like(flags))
    _, g_bwd = grad_batch_dual(params, w, d, p, lengths, labels, np.zeros_like(flags))
    # direction weights only move for their own rows
    for f in GRU_FIELDS:
        assert np.allclose(g_fwd[f"bwd_{f}"], 0.0)
        assert np.allclose(g_bwd[f"fwd_{f}"], 0.0)
    # mixed-batch embedding grad is NOT either single-direction grad alone
    assert not np.allclose(g_mixed["word_emb"], g_fwd["word_emb"])
    assert not np.allclose(g_mixed["word_emb"], g_bwd["word_emb"])


@pytest.fixture(scope="module")
def single_examples(ray_session):
    import ray.data as rd

    from relation_extraction_ray.pipelines.fit import build_record_vocabs, encode_single_examples
    from relation_extraction_ray.sources.semeval import labeled_sentences_table, parsed_records

    parsed = parsed_records(rd.from_arrow(labeled_sentences_table(250))).materialize()
    cfg = KGConfig()
    vocabs = build_record_vocabs(parsed, cfg)
    examples = encode_single_examples(parsed, vocabs, cfg).materialize()
    return parsed, vocabs, examples


def test_single_examples_are_reversed_dual_pairs(single_examples):
    from relation_extraction_ray.nlp.labeler import lookup_inverse_relation

    _, _, examples = single_examples
    rows = sorted(examples.take_all(), key=lambda r: (r["sent_id"], not r["predict_x"]))
    assert len(rows) % 2 == 0 and len(rows) > 0
    for fwd, rev in zip(rows[0::2], rows[1::2]):
        assert fwd["sent_id"] == rev["sent_id"]
        assert fwd["predict_x"] and not rev["predict_x"]
        assert rev["word_ids"] == fwd["word_ids"][::-1]
        assert rev["dep_ids"] == fwd["dep_ids"][::-1]
        assert rev["label"] == lookup_inverse_relation(fwd["label"])


def test_fit_dual_learns_and_classifies(single_examples):
    from relation_extraction_ray.eval import evaluate_classification
    from relation_extraction_ray.pipelines.fit import dual_model_classify, fit_dual_classifier

    parsed, vocabs, examples = single_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))

    params, losses = fit_dual_classifier(examples, sizes, epochs=25, batch_size=64, lr=5e-3)
    assert losses[-1] < losses[0] * 0.5, losses[::5]

    # deterministic: same fit twice -> identical weights
    params2, _ = fit_dual_classifier(examples, sizes, epochs=2, batch_size=64, lr=5e-3)
    params3, _ = fit_dual_classifier(examples, sizes, epochs=2, batch_size=64, lr=5e-3)
    for f in dual_fields_of(params2):
        assert np.array_equal(params2[f], params3[f]), f

    preds = dual_model_classify(parsed, params, (wv, dv, pv))
    m = evaluate_classification(preds)
    assert m["macro_f1"] > 0.5, m["macro_f1"]


@pytest.fixture(scope="module")
def kg_encoded(ray_session):
    from relation_extraction_ray.pipelines.kg import KGPipeline
    from relation_extraction_ray.sources.synth import documents_dataset

    pipe = KGPipeline(batch_size=64)
    sent = pipe.sentences(documents_dataset(60, override_num_blocks=4)).materialize()
    vocabs = pipe.vocabs(sent)
    encoded = pipe.encoded(sent, vocabs).filter(expr="verdict == 'GOOD'").materialize()
    return encoded, vocabs


def test_fit_clustered_softmax_learns_cluster_pairs(kg_encoded):
    from relation_extraction_ray.pipelines.fit import (
        _examples_to_arrays,
        clustered_softmax_examples,
        fit_clustered,
    )

    encoded, vocabs = kg_encoded
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    K = 4
    # deterministic synthetic Brown map over target word ids
    clusters = {i: i % (K - 1) for i in range(len(wv))}

    examples = clustered_softmax_examples(encoded, clusters, K).materialize()
    assert examples.count() == encoded.count()
    labs = [r["label_id"] for r in examples.take_all()]
    assert all(0 <= l < K * K for l in labs)

    wts, losses = fit_clustered(encoded, clusters, K, sizes, epochs=20, batch_size=64, lr=5e-3)
    assert wts.w_out.shape[1] == K * K  # the head IS the K^2 clustered softmax
    assert losses[-1] < losses[0] * 0.7, losses[::5]

    w, d, p, labels, _targets = _examples_to_arrays(examples)
    ww, dd, pp, lengths = pad_paths(w, d, p)
    pred, _ = score_batch(wts, ww, dd, pp, lengths)
    acc = float((pred == labels).mean())
    untrained = weights_fixture(*sizes, seed=7, n_out=K * K)
    pred_u, _ = score_batch(untrained, ww, dd, pp, lengths)
    acc_u = float((pred_u == labels).mean())
    assert acc > max(1.0 / (K * K) * 2, acc_u), (acc, acc_u)


def test_dual_distributed_single_step_equals_local(single_examples):
    """One distributed dual Adam step == the local loop run full-batch."""
    import numpy as np
    import pytest

    from relation_extraction_ray.pipelines.fit import (
        fit_dual_classifier,
        fit_dual_classifier_distributed,
    )
    from relation_extraction_ray.state.scorer import dual_fields_of

    _, vocabs, singles = single_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    local, l_losses = fit_dual_classifier(singles, sizes, epochs=1, batch_size=10**9, lr=1e-2)
    dist, d_losses = fit_dual_classifier_distributed(
        singles.repartition(4), sizes, epochs=1, steps_per_epoch=1, lr=1e-2
    )
    assert d_losses[0] == pytest.approx(l_losses[0], rel=1e-6)
    for f in dual_fields_of(local):
        assert np.allclose(dist[f], local[f], atol=1e-6), f


def test_dual_distributed_descends_deterministic_and_resumes(single_examples, tmp_path, monkeypatch):
    import numpy as np
    import pytest

    import relation_extraction_ray.pipelines.fit as fit_mod
    from relation_extraction_ray.state.scorer import dual_fields_of

    _, vocabs, singles = single_examples
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes = (len(wv), len(dv), len(pv))
    kw = dict(epochs=3, steps_per_epoch=2, lr=1e-2)
    ref, losses = fit_mod.fit_dual_classifier_distributed(singles, sizes, **kw)
    assert losses[-1] < losses[0]

    ck = str(tmp_path / "dual.ck.npz")
    real = fit_mod.distributed_grad_dual
    calls = {"n": 0}

    def dying(*a, **k):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("crash")
        return real(*a, **k)

    monkeypatch.setattr(fit_mod, "distributed_grad_dual", dying)
    with pytest.raises(RuntimeError):
        fit_mod.fit_dual_classifier_distributed(
            singles, sizes, checkpoint_path=ck, checkpoint_every_s=0.0, **kw
        )
    monkeypatch.setattr(fit_mod, "distributed_grad_dual", real)
    got, got_losses = fit_mod.fit_dual_classifier_distributed(
        singles, sizes, checkpoint_path=ck, checkpoint_every_s=0.0, **kw
    )
    assert got_losses == losses
    for f in dual_fields_of(ref):
        assert np.array_equal(got[f], ref[f]), f
