"""Official SemEval-2010 Task-8 scoring — exact reimplementation of the
shipped perl scorer's mode (iii), "(9+1)-way evaluation taking
directionality into account", which is the task's OFFICIAL metric
(``SemEval2010_task8_scorer-v1.2/semeval2010_task8_scorer-v1.2.pl``,
specifically ``evaluate()`` with ``$useWrongDir=1``, lines 214-382):

* predictions collapse to 9 base relations + ``_Other``;
* an exact (relation AND direction) match counts for the diagonal;
* relation-right/direction-wrong predictions go to a WRONG_DIR row that
  inflates the relation's precision DENOMINATOR but never its numerator;
* skipped ids (present in the key, absent from the proposal) count against
  recall only;
* P/R/F1 per answer relation; macro = mean over non-Other relations of
  the per-relation values (mean-of-F1s, not F1-of-means).

The module is validated against the scorer's five shipped worked examples
(``proposed_answer*/answer_key*`` → ``result_scores*``) in
``tests/test_semeval_real.py`` — bit-for-bit on every printed number.

Input shapes: either id→label dicts (the golden-file path) or directed
(pred, label, n) pair counts (the distributed path — the output of
``eval.confusion_counts`` over a predictions Dataset).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from .nlp.labeler import LABELS

_VALID = set(LABELS)
#: direction-less base relations (TEST_FILE_KEY.TXT ships these; the
#: directional test_keys.txt is what the official mode-(iii) score uses)
_VALID_NODIR = {lab.split("(")[0] for lab in LABELS}
OTHER_KEY = "_Other"


def _nodir(label: str) -> str:
    """``Rel(ei,ej)`` → ``Rel``; ``Other`` → ``_Other`` (scorer's
    ``getIDandLabel``/regex strip)."""
    if label in ("Other", OTHER_KEY):
        return OTHER_KEY
    cut = label.find("(")
    return label if cut < 0 else label[:cut]


def validate_label(label: str) -> None:
    if label not in _VALID:
        raise ValueError(f"invalid SemEval label: {label!r}")


def official_scores_from_pairs(
    pair_counts: list[tuple[str, str, int]],
    skipped_by_answer: dict[str, int] | None = None,
) -> dict:
    """Score from directed (proposed_label, answer_label, count) pairs.

    ``skipped_by_answer``: answer-label (directed) → count of key ids with
    no proposal (scorer: missing ids hurt recall/accuracy only).
    """
    conf: dict[tuple[str, str], int] = defaultdict(int)  # (propNoDir, ansNoDir)
    wrong_dir: dict[str, int] = defaultdict(int)  # ansNoDir -> n
    proposed_cnt: dict[str, int] = defaultdict(int)  # propNoDir (excl WRONG_DIR)
    answer_cnt: Counter = Counter()
    total_proposed = 0

    for lp, la, n in pair_counts:
        validate_label(lp)
        validate_label(la)
        lpn, lan = _nodir(lp), _nodir(la)
        total_proposed += n
        answer_cnt[lan] += n
        if lp == la:
            conf[(lpn, lan)] += n
            proposed_cnt[lpn] += n
        elif lpn == lan:  # relation right, direction wrong
            wrong_dir[lan] += n
        else:
            conf[(lpn, lan)] += n
            proposed_cnt[lpn] += n

    for la, n in (skipped_by_answer or {}).items():
        validate_label(la)
        answer_cnt[_nodir(la)] += n
    total_answer = sum(answer_cnt.values())

    per_relation: dict[str, dict] = {}
    macro_p = macro_r = macro_f1 = 0.0
    micro_correct = micro_proposed = micro_answer = 0
    freq_correct = 0
    for lan in sorted(answer_cnt):
        c = conf.get((lan, lan), 0)
        freq_correct += c
        wd = wrong_dir.get(lan, 0)
        prop = proposed_cnt.get(lan, 0)
        p = 0.0 if prop == 0 else 100.0 * c / (prop + wd)
        r = 0.0 if answer_cnt[lan] == 0 else 100.0 * c / answer_cnt[lan]
        f1 = 0.0 if p + r == 0 else 2 * p * r / (p + r)
        per_relation[lan] = {
            "correct": c,
            "proposed": prop + wd,
            "answer": answer_cnt[lan],
            "p": p,
            "r": r,
            "f1": f1,
        }
        if lan != OTHER_KEY:
            macro_p += p
            macro_r += r
            macro_f1 += f1
            micro_correct += c
            micro_proposed += prop + wd
            micro_answer += answer_cnt[lan]

    n_rel = len(answer_cnt) - (1 if OTHER_KEY in answer_cnt else 0)
    n_rel = max(1, n_rel)
    micro_p = 0.0 if micro_proposed == 0 else 100.0 * micro_correct / micro_proposed
    micro_r = 0.0 if micro_answer == 0 else 100.0 * micro_correct / micro_answer
    # skipped-as-Other accuracy: Other-row shortfall vs the key
    other_row_proposed = sum(
        conf.get((lpn, OTHER_KEY), 0) for lpn in set(answer_cnt) | set(proposed_cnt)
    )
    other_skipped = answer_cnt.get(OTHER_KEY, 0) - other_row_proposed - wrong_dir.get(OTHER_KEY, 0)
    return {
        "per_relation": per_relation,
        "coverage": 100.0 * total_proposed / total_answer if total_answer else 0.0,
        "accuracy": 100.0 * freq_correct / total_proposed if total_proposed else 0.0,
        "accuracy_skipped_wrong": 100.0 * freq_correct / total_answer if total_answer else 0.0,
        "accuracy_skipped_other": 100.0 * (freq_correct + other_skipped) / total_answer
        if total_answer
        else 0.0,
        "micro_p": micro_p,
        "micro_r": micro_r,
        "micro_f1": 0.0 if micro_p + micro_r == 0 else 2.0 * micro_p * micro_r / (micro_p + micro_r),
        "macro_p": macro_p / n_rel,
        "macro_r": macro_r / n_rel,
        "macro_f1": macro_f1 / n_rel,
        "official_f1": macro_f1 / n_rel,
    }


def official_semeval_scores(proposed: dict[int, str], answer: dict[int, str]) -> dict:
    """Golden-file interface: id→label dicts, exactly like the perl CLI
    (the proposal may cover a subset of key ids — skipped examples)."""
    pair_counts: Counter = Counter()
    skipped: Counter = Counter()
    for id_, la in answer.items():
        lp = proposed.get(id_)
        if lp is None:
            skipped[la] += 1
        else:
            pair_counts[(lp, la)] += 1
    extra = set(proposed) - set(answer)
    if extra:
        raise ValueError(f"proposed ids missing from the key: {sorted(extra)[:5]}")
    return official_scores_from_pairs(
        [(lp, la, n) for (lp, la), n in pair_counts.items()], dict(skipped)
    )


def read_key_file(path: str, allow_nodir: bool = False) -> dict[int, str]:
    """``<id>\\t<label>`` lines → dict (scorer ``readFileIntoHash``; dup ids
    are an error).  ``allow_nodir`` additionally accepts direction-less
    base relations (the format of ``TEST_FILE_KEY.TXT``)."""
    out: dict[int, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            sid_str, _, label = line.partition("\t")
            sid = int(sid_str)
            if sid in out:
                raise ValueError(f"duplicate id {sid} in {path}")
            label = label.strip()
            if not (allow_nodir and label in _VALID_NODIR):
                validate_label(label)
            out[sid] = label
    return out
