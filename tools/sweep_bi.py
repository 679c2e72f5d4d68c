#!/usr/bin/env python
"""Round-4 model sweep: bidirectional GRU trunk vs the round-3 flagship.

Protocol (same discipline as round 3's dims sweep — BASELINE.md):
90/10 split of the REAL SemEval TRAIN file by sent_id (% 10 == 0 held
out), every candidate trained ONLY on the 90 % with vocabs/init built
from the 90 %, compared by OFFICIAL macro-F1 on the held-out 10 %.
The winner is then retrained on the full 8k train set by
tools/train_fixture.py and measured ONCE on the real test split.

Run:  python tools/sweep_bi.py [--configs uni_alt,bi_sup,bi_alt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEMEVAL = "/root/reference/SemEval2010_task8_all_data"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="uni_alt,bi_sup,bi_alt,bi_alt_h48")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default="/tmp/sweep_bi.json")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc

    from relation_extraction_ray.config import KGConfig
    from relation_extraction_ray.eval_semeval import official_scores_from_pairs
    from relation_extraction_ray.functions.training import pretrain_word_vectors
    from relation_extraction_ray.pipelines.fit import (
        bi_model_classify,
        build_record_vocabs,
        encode_examples,
        fit_alternating,
        fit_bi_alternating,
        fit_bi_classifier,
        model_classify,
    )
    from relation_extraction_ray.sources.semeval import parsed_records, read_semeval_records
    from relation_extraction_ray.state.scorer import D_WORD

    cfg = KGConfig(min_count=2)
    parsed_all = parsed_records(
        read_semeval_records(f"{SEMEVAL}/SemEval2010_task8_training/TRAIN_FILE.TXT")
    ).materialize()

    def split(batch: pa.Table, keep_valid: bool) -> pa.Table:
        import numpy as np

        mod = pa.array(batch.column("sent_id").to_numpy() % 10 == 0)
        return batch.filter(mod if keep_valid else pc.invert(mod))

    train_parsed = parsed_all.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    ).materialize()
    valid_parsed = parsed_all.map_batches(
        lambda b: split(b, True), batch_format="pyarrow"
    ).materialize()
    print(f"train={train_parsed.count()} valid={valid_parsed.count()}", flush=True)

    # Vocab/init scopes.  "train": 90%-split text only (round-3/4 baseline
    # arms).  "full": vocab + skip-gram init built over ALL available text —
    # train90 + valid10 + the unlabeled TEST sentences — which is the
    # reference's own preprocessing (semeval2sdp.py:305-308 feeds
    # train+valid+test sents to create_vocab_from_data; its GoogleNews init
    # likewise covers test-split words).  Labels are never read from valid/
    # test: only token text enters the vocab count and the SGNS pairs, and
    # supervised examples stay train90-encoded.
    test_parsed = parsed_records(
        read_semeval_records(
            f"{SEMEVAL}/SemEval2010_task8_testing_keys/TEST_FILE_CLEAN.TXT"
        )
    ).materialize()

    scope_cache: dict[str, tuple] = {}

    def get_scope(scope: str):
        if scope not in scope_cache:
            text_parsed = (
                train_parsed
                if scope == "train"
                else train_parsed.union(valid_parsed, test_parsed).materialize()
            )
            vocabs = build_record_vocabs(text_parsed, cfg)
            (wv, w2i, _), (dv, _, _), (pv, _, _) = vocabs
            sizes = (len(wv), len(dv), len(pv))
            examples = encode_examples(train_parsed, vocabs, cfg).materialize()
            init_w = pretrain_word_vectors(
                text_parsed, w2i, dim=D_WORD, window=4, epochs=10, lr=0.05
            )
            print(f"scope={scope}: vocab {len(wv)} words", flush=True)
            scope_cache[scope] = (vocabs, sizes, examples, init_w, text_parsed, w2i)
        return scope_cache[scope]

    vocabs, sizes, examples, init_w, _, w2i = get_scope("train")
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs

    def valid_f1(classified) -> float:
        pairs: dict[tuple[str, str], int] = {}
        for r in classified.take_all():
            k = (r["pred"], r["label"])
            pairs[k] = pairs.get(k, 0) + 1
        s = official_scores_from_pairs([(p, a, n) for (p, a), n in pairs.items()])
        return s["official_f1"]

    results: dict[str, dict] = {}

    def record(name: str, f1: float, secs: float, extra: str = "") -> None:
        results[name] = {"valid_f1": round(f1, 2), "secs": round(secs, 1), "note": extra}
        print(f"[{name}] valid official F1 {f1:.2f}  ({secs:.0f}s) {extra}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    want = set(args.configs.split(","))

    if "uni_alt" in want:  # round-3 flagship recipe, on the 90% split
        t0 = time.time()
        wts, _ = fit_alternating(
            examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_w,
        )
        f1 = valid_f1(model_classify(valid_parsed, wts, (wv, dv, pv), cfg))
        record("uni_alt", f1, time.time() - t0, "round-3 recipe (baseline arm)")

    if "bi_sup" in want:  # bi trunk, supervised only
        t0 = time.time()
        params, _ = fit_bi_classifier(
            examples, sizes, epochs=args.epochs, batch_size=256, lr=args.lr,
            init_word_emb=init_w,
        )
        f1 = valid_f1(bi_model_classify(valid_parsed, params, (wv, dv, pv), cfg))
        record("bi_sup", f1, time.time() - t0)

    if "bi_alt" in want:  # bi trunk, alternating NEG+sup (flagship recipe)
        t0 = time.time()
        params, _ = fit_bi_alternating(
            examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_w,
        )
        f1 = valid_f1(bi_model_classify(valid_parsed, params, (wv, dv, pv), cfg))
        record("bi_alt", f1, time.time() - t0)

    if "bi_alt_h48" in want:  # halved per-direction hidden (96 concat ~ uni 64+)
        t0 = time.time()
        params, _ = fit_bi_alternating(
            examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_w,
            dims={"d_hidden": 48},
        )
        f1 = valid_f1(bi_model_classify(valid_parsed, params, (wv, dv, pv), cfg))
        record("bi_alt_h48", f1, time.time() - t0, "d_hidden=48 per direction")

    if "uni_alt_vfull" in want:  # round-3 recipe, vocab/init over ALL text
        vocabs_f, sizes_f, examples_f, init_f, _, _ = get_scope("full")
        (wvf, _, _), (dvf, _, _), (pvf, _, _) = vocabs_f
        t0 = time.time()
        wts, _ = fit_alternating(
            examples_f, sizes_f, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_f,
        )
        f1 = valid_f1(model_classify(valid_parsed, wts, (wvf, dvf, pvf), cfg))
        record(
            "uni_alt_vfull", f1, time.time() - t0,
            "vocab+SGNS init over train+valid+test text (ref semeval2sdp.py:305-308)",
        )

    unsup_cache: dict[str, object] = {}

    def get_unsup_examples(scope: str):
        # Label-free NEG corpus over ALL text (train90+valid10+test SDPs) —
        # the reference's wikipretrain alternation runs its unsup epochs on
        # unlabeled wiki SDPs (RelEmbed Supervised with wikipretrain.ipynb);
        # here the extra unlabeled SDPs are the valid/test sentences.
        if scope not in unsup_cache:
            s_vocabs, _, _, _, s_text, _ = get_scope(scope)
            unsup_cache[scope] = encode_examples(s_text, s_vocabs, cfg).materialize()
        return unsup_cache[scope]

    if "uni_alt_vfull_utest" in want:
        vocabs_f, sizes_f, examples_f, init_f, _, _ = get_scope("full")
        (wvf, _, _), (dvf, _, _), (pvf, _, _) = vocabs_f
        t0 = time.time()
        wts, _ = fit_alternating(
            examples_f, sizes_f, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_f,
            unsup_examples=get_unsup_examples("full"),
        )
        f1 = valid_f1(model_classify(valid_parsed, wts, (wvf, dvf, pvf), cfg))
        record(
            "uni_alt_vfull_utest", f1, time.time() - t0,
            "full-text vocab/init + NEG phase over all unlabeled SDPs",
        )

    if "bi_alt_h48_vfull_utest" in want:
        vocabs_f, sizes_f, examples_f, init_f, _, _ = get_scope("full")
        (wvf, _, _), (dvf, _, _), (pvf, _, _) = vocabs_f
        t0 = time.time()
        params, _ = fit_bi_alternating(
            examples_f, sizes_f, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_f,
            dims={"d_hidden": 48}, unsup_examples=get_unsup_examples("full"),
        )
        f1 = valid_f1(bi_model_classify(valid_parsed, params, (wvf, dvf, pvf), cfg))
        record(
            "bi_alt_h48_vfull_utest", f1, time.time() - t0,
            "full-text vocab/init + NEG over all unlabeled SDPs, h48",
        )

    if "bi_alt_h48_vfull" in want:
        vocabs_f, sizes_f, examples_f, init_f, _, _ = get_scope("full")
        (wvf, _, _), (dvf, _, _), (pvf, _, _) = vocabs_f
        t0 = time.time()
        params, _ = fit_bi_alternating(
            examples_f, sizes_f, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_f,
            dims={"d_hidden": 48},
        )
        f1 = valid_f1(bi_model_classify(valid_parsed, params, (wvf, dvf, pvf), cfg))
        record("bi_alt_h48_vfull", f1, time.time() - t0, "full-text vocab/init, h48")

    # generic dims/schedule probes around the best arm: name pattern
    # biX[_h<H>][_w<DW>][_c<CY>u<UE>s<SE>][_s<SEED>][_pw<WIN>][_pe<EP>][_vf]
    # (pw/pe vary the skip-gram INIT window/epochs; w<DW> re-pretrains the
    # init at the matching word dim; vf = full-text vocab/init scope)
    init_cache: dict[tuple, object] = {("train", D_WORD, 4, 10): init_w}
    for name in sorted(want):
        if not name.startswith("biX"):
            continue
        t0 = time.time()
        dims: dict = {}
        cy, ue, se, seed, pw, pe, scope = 3, 1, 10, 7, 4, 10, "train"
        for tokn in name.split("_")[1:]:
            if tokn == "vf":
                scope = "full"
            elif tokn.startswith("pw"):
                pw = int(tokn[2:])
            elif tokn.startswith("pe"):
                pe = int(tokn[2:])
            elif tokn.startswith("h"):
                dims["d_hidden"] = int(tokn[1:])
            elif tokn.startswith("w"):
                dims["d_word"] = int(tokn[1:])
            elif tokn.startswith("c"):
                import re as _re

                m = _re.match(r"c(\d+)u(\d+)s(\d+)", tokn)
                cy, ue, se = int(m.group(1)), int(m.group(2)), int(m.group(3))
            elif tokn.startswith("s") and tokn[1:].isdigit():
                seed = int(tokn[1:])
        s_vocabs, s_sizes, s_examples, _, s_text, s_w2i = get_scope(scope)
        (swv, _, _), (sdv, _, _), (spv, _, _) = s_vocabs
        dw = dims.get("d_word", D_WORD)
        ikey = (scope, dw, pw, pe)
        if ikey not in init_cache:
            init_cache[ikey] = pretrain_word_vectors(
                s_text, s_w2i, dim=dw, window=pw, epochs=pe, lr=0.05
            )
        params, _ = fit_bi_alternating(
            s_examples, s_sizes, cycles=cy, unsup_epochs=ue, sup_epochs=se,
            batch_size=256, lr=args.lr, seed=seed, init_word_emb=init_cache[ikey],
            dims=dims,
        )
        f1 = valid_f1(bi_model_classify(valid_parsed, params, (swv, sdv, spv), cfg))
        record(
            name, f1, time.time() - t0,
            f"dims={dims} cy={cy} ue={ue} se={se} seed={seed} pw={pw} pe={pe} scope={scope}",
        )

    if "ens_uni_bi48" in want:
        # probability-averaging ensemble of the two committed recipes,
        # trained on the SAME 90 % split (uni_alt + bi_alt_h48); accept for
        # a single full-train test measurement only if valid beats both
        # member arms
        import ray as _ray

        from relation_extraction_ray.pipelines.fit import EnsembleClassifyStage
        from relation_extraction_ray.taskexec import cached_stage_fn

        t0 = time.time()
        wts_u, _ = fit_alternating(
            examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_w,
        )
        params_b, _ = fit_bi_alternating(
            examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_w,
            dims={"d_hidden": 48},
        )
        members = [("uni", wts_u, (wv, dv, pv)), ("bi", params_b, (wv, dv, pv))]
        mref = _ray.put(members)
        classified = valid_parsed.map_batches(
            cached_stage_fn(
                EnsembleClassifyStage, mref.hex(), {"models_ref": mref, "cfg": cfg}
            ),
            batch_format="pyarrow",
        )
        f1 = valid_f1(classified)
        record(
            "ens_uni_bi48", f1, time.time() - t0,
            "equal-weight prob average of uni_alt + bi_alt_h48 (same split)",
        )

    if "ens3_uni_bi48_dual" in want:
        # 3-member ensemble: uni_alt + bi_alt_h48 + dual single model, all
        # trained on the SAME 90 % split; also records the 2-member valid
        # F1 from the same trained members for a like-for-like comparison
        import ray as _ray

        from relation_extraction_ray.pipelines.fit import (
            EnsembleClassifyStage,
            encode_single_examples,
            fit_dual_classifier,
        )
        from relation_extraction_ray.taskexec import cached_stage_fn

        t0 = time.time()
        wts_u, _ = fit_alternating(
            examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_w,
        )
        params_b, _ = fit_bi_alternating(
            examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
            batch_size=256, lr=args.lr, init_word_emb=init_w,
            dims={"d_hidden": 48},
        )
        singles = encode_single_examples(train_parsed, vocabs, cfg).materialize()
        params_d, _ = fit_dual_classifier(
            singles, sizes, epochs=30, batch_size=256, lr=args.lr,
            init_word_emb=init_w,
        )

        def ens_f1(members):
            mref = _ray.put(members)
            classified = valid_parsed.map_batches(
                cached_stage_fn(
                    EnsembleClassifyStage, mref.hex(), {"models_ref": mref, "cfg": cfg}
                ),
                batch_format="pyarrow",
            )
            return valid_f1(classified)

        vv = (wv, dv, pv)
        f2 = ens_f1([("uni", wts_u, vv), ("bi", params_b, vv)])
        f3 = ens_f1([("uni", wts_u, vv), ("bi", params_b, vv), ("dual", params_d, vv)])
        record("ens2_same_run", f2, time.time() - t0, "uni+bi48 (same members as ens3)")
        record("ens3_uni_bi48_dual", f3, 0.0, "uni+bi48+dual equal-weight")

    if "ens5_2seed" in want:
        # pre-registered single candidate: seed-diverse 5-member ensemble
        # [uni s7, uni s11, bi_h48 s7, bi_h48 s11, dual]; compared on valid
        # against the accepted ens3 (69.98) — one test run only if it wins
        import ray as _ray

        from relation_extraction_ray.pipelines.fit import (
            EnsembleClassifyStage,
            encode_single_examples,
            fit_dual_classifier,
        )
        from relation_extraction_ray.taskexec import cached_stage_fn

        t0 = time.time()
        members = []
        for seed in (7, 11):
            wts_u, _ = fit_alternating(
                examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
                batch_size=256, lr=args.lr, seed=seed, init_word_emb=init_w,
            )
            members.append(("uni", wts_u, (wv, dv, pv)))
        for seed in (7, 11):
            params_b, _ = fit_bi_alternating(
                examples, sizes, cycles=3, unsup_epochs=1, sup_epochs=10,
                batch_size=256, lr=args.lr, seed=seed, init_word_emb=init_w,
                dims={"d_hidden": 48},
            )
            members.append(("bi", params_b, (wv, dv, pv)))
        singles = encode_single_examples(train_parsed, vocabs, cfg).materialize()
        params_d, _ = fit_dual_classifier(
            singles, sizes, epochs=30, batch_size=256, lr=args.lr,
            init_word_emb=init_w,
        )
        members.append(("dual", params_d, (wv, dv, pv)))
        mref = _ray.put(members)
        classified = valid_parsed.map_batches(
            cached_stage_fn(
                EnsembleClassifyStage, mref.hex(), {"models_ref": mref, "cfg": cfg}
            ),
            batch_format="pyarrow",
        )
        f1 = valid_f1(classified)
        record("ens5_2seed", f1, time.time() - t0, "uni s7+s11, bi48 s7+s11, dual")

    print(json.dumps(results, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
