"""Shortest-dependency-path (SDP) extraction + vocab semantics.

Pure-Python, deterministic reimplementation of the reference's extraction
chain over our :class:`~relation_extraction_ray.nlp.parser.Sentence`:

* ``smart_token_text``      — ``wiki2sdp.py:46-53`` (lowercase, ``<PUNCT>``,
  ``<NUM>``; num overrides punct, same apply order as the reference)
* ``dependency_path_to_root`` — ``wiki2sdp.py:55-62``
* ``find_common_ancestor``  — ``wiki2sdp.py:64-70`` (first element of X's
  root path present in Y's, compared by char offset ``idx``)
* ``sentence_to_sdps``      — the 3-topology-case extractor with endpoint
  ``<X>/<Y>`` substitution and length bounds, 3-tuple (word, dep, pos)
  variant: ``wiki_and_semeval2sdp.py:74-187``; pair enumeration
  ``wiki2sdp.py:31-44``
* ``post_process_path``     — drop ``<PUNCT>`` elements, ``wiki2sdp.py:235-239``
* ``finalize_vocab``        — frequency-ranked vocab + specials
  ``[<OOV>,<X>,<Y>,<NUM>,<PUNCT>]`` appended in that order with OOV
  pseudo-count, ``wiki2sdp.py:186-233``. The reference relies on
  ``Counter.most_common()`` tie order; we fix the total order to
  (count desc, token asc) — SURVEY.md §7.5.
* ``is_ok_sdp``             — OOV-target / OOV-ratio / non-empty / optional
  dep-structure-whitelist predicate, ``wiki_and_semeval2sdp.py:267-293``.
  (The wiki-only variant at ``wiki2sdp.py:241-258`` compares against
  ``int2vocab.keys()[-1]``, a Python-2 dict-order artifact that points at
  ``<PUNCT>`` rather than ``<OOV>``; we implement the documented intent —
  compare against the ``<OOV>`` id — matching the combined builder.)

These functions are shared by the Ray stages and the oracle, so pipeline
outputs are bit-comparable to single-process goldens.
"""

from __future__ import annotations

from collections.abc import Iterator

from .parser import Sentence, chunk_head

SPECIALS = ["<OOV>", "<X>", "<Y>", "<NUM>", "<PUNCT>"]


def smart_token_text(sent: Sentence, i: int, lower: bool = True) -> str:
    text = sent.tokens[i].lower() if lower else sent.tokens[i]
    if sent.is_punct[i]:
        text = "<PUNCT>"
    if sent.like_num[i]:
        text = "<NUM>"
    return text


def dependency_path_to_root(sent: Sentence, i: int) -> list[int]:
    """Token indices from ``i`` up to (and including) the root."""
    path = [i]
    seen = {i}
    while sent.head[i] != i:
        i = sent.head[i]
        if i in seen:  # defensive: malformed tree — treat as rooted here
            break
        seen.add(i)
        path.append(i)
    return path


def find_common_ancestor(sent: Sentence, p1: list[int], p2: list[int]) -> int | None:
    """First token of ``p1`` whose char offset appears in ``p2``
    (reference compares ``t1.idx == t2.idx``, ``wiki2sdp.py:64-70``)."""
    p2_idx = {sent.idx[t] for t in p2}
    for t in p1:
        if sent.idx[t] in p2_idx:
            return t
    return None


def chunk_pairs(sent: Sentence) -> list[tuple[int, int]]:
    """n-choose-2 ordered pairs of noun-chunk head tokens in document order
    (``sentence_to_chunk_pairs``, ``wiki2sdp.py:31-44``)."""
    heads = [chunk_head(sent.pos, span) for span in sent.chunks]
    pairs = []
    for a in range(len(heads) - 1):
        for b in range(a + 1, len(heads)):
            pairs.append((heads[a], heads[b]))
    return pairs


def sdp_between(sent: Sentence, x: int, y: int, include_ends: bool = False) -> list[tuple[str, str, str]] | None:
    """Build the (word, dep, pos) SDP between tokens ``x`` and ``y``.

    Three topology cases exactly as ``wiki_and_semeval2sdp.py:96-140``:
    (1) no common ancestor → None; (2) X or Y is the ancestor → single chain
    oriented X→Y; (3) distinct ancestor Z → X-chain up to Z + reversed
    Y-chain excluding Z. Endpoints replaced by ``<X>/<Y>`` placeholders
    unless ``include_ends``.
    """
    x_path = dependency_path_to_root(sent, x)
    y_path = dependency_path_to_root(sent, y)
    common = find_common_ancestor(sent, x_path, y_path)
    if common is None:
        return None

    def tup(i: int) -> tuple[str, str, str]:
        return (smart_token_text(sent, i), sent.dep[i], sent.pos[i])

    if common == x:
        sdp = []
        for t in y_path:  # (Y <- ... <- X <-) ...
            sdp.append(tup(t))
            if t == common:
                break
        sdp = list(reversed(sdp))  # -> X -> ... -> Y
    elif common == y:
        sdp = []
        for t in x_path:  # (X <- ... <- Y <-) ...
            sdp.append(tup(t))
            if t == common:
                break
    else:
        sdp = []
        for t in x_path:  # (X <- ... <- Z <-) ... keep Z
            sdp.append(tup(t))
            if t == common:
                break
        ysdp = []
        for t in y_path:  # (Y <- ... <-) Z : drop Z from this side
            if t == common:
                break
            ysdp.append(tup(t))
        sdp.extend(reversed(ysdp))
    if not include_ends:
        sdp[0] = ("<X>", sdp[0][1], sdp[0][2])
        sdp[-1] = ("<Y>", sdp[-1][1], sdp[-1][2])
    return sdp


def sentence_to_sdps(
    sent: Sentence,
    min_len: int = 1,
    max_len: int = 7,
    include_ends: bool = False,
    max_pairs: int | None = 200,
) -> Iterator[dict]:
    """All SDPs between noun-chunk-head pairs of one sentence.

    Yields ``{'path': [(word, dep, pos), ...], 'target': (x_lower, y_lower)}``
    with raw lowercased surface targets (``wiki2sdp.py:184`` — targets are
    NOT smart-normalized). ``max_pairs`` bounds the O(k²) candidate fan-out
    on pathological sentences (scale guard; reference is unbounded).
    """
    pairs = chunk_pairs(sent)
    if max_pairs is not None:
        pairs = pairs[:max_pairs]
    for x, y in pairs:
        sdp = sdp_between(sent, x, y, include_ends=include_ends)
        if sdp is None:
            continue  # case (1)
        if len(sdp) < min_len or len(sdp) > max_len:
            continue
        yield {
            "path": sdp,
            "target": (sent.tokens[x].lower(), sent.tokens[y].lower()),
        }


def token_span_path(
    sent: Sentence, x: int, y: int, include_ends: bool = False
) -> list[tuple[str, str, str]]:
    """M8 — ``--sentence`` mode (``convert_nominals_to_sentence``,
    ``semeval_data_helper.py:130-151``): the "path" is the raw token
    subsequence from X to Y inclusive (document order), endpoints replaced
    by ``<X>``/``<Y>`` unless ``include_ends``."""
    lo, hi = (x, y) if x <= y else (y, x)
    path = [
        (smart_token_text(sent, i), sent.dep[i], sent.pos[i]) for i in range(lo, hi + 1)
    ]
    if not include_ends and path:
        first_tag = "<X>" if x <= y else "<Y>"
        last_tag = "<Y>" if x <= y else "<X>"
        path[0] = (first_tag, path[0][1], path[0][2])
        path[-1] = (last_tag, path[-1][1], path[-1][2])
    return path


def post_process_path(path: list[tuple[str, str, str]]) -> list[tuple[str, str, str]]:
    """Drop ``<PUNCT>`` elements (``post_process_sdp``, ``wiki2sdp.py:235-239``)."""
    return [t for t in path if t[0] != "<PUNCT>"]


def finalize_vocab(
    counts: dict[str, int],
    vocab_limit: int | None = None,
    min_count: int | None = None,
    oov_count: int = 1,
) -> tuple[list[str], dict[str, int], list[float]]:
    """Token counts → (vocab list, token→id, unigram distribution).

    Mirrors ``create_vocab_from_data`` truncation semantics
    (``wiki2sdp.py:206-228``): ``vocab_limit`` trumps ``min_count``; with
    ``min_count`` the cut is at the first sorted count below it; the 5
    specials are appended in fixed order, each given ``oov_count`` frequency.
    Total order: (count desc, token asc).
    """
    items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(items)
    if not (vocab_limit or min_count):
        limit = n
    elif vocab_limit is not None:
        limit = min(vocab_limit, n)
    else:
        limit = n
        for i, (_, c) in enumerate(items):
            if c < min_count:
                limit = i
                break
    kept = items[:limit]
    vocab = [t for t, _ in kept] + list(SPECIALS)
    freqs = [c for _, c in kept] + [oov_count] * 5
    total = float(sum(freqs))
    dist = [f / total for f in freqs]
    vocab2int = {t: i for i, t in enumerate(vocab)}
    return vocab, vocab2int, dist


def vocab2idx(token: str, vocab2int: dict[str, int]) -> int:
    """token → id with ``<OOV>`` fallback (``wiki2sdp.py:260-267``)."""
    return vocab2int.get(token, vocab2int["<OOV>"])


def is_ok_sdp(
    path_ids: list[tuple[int, int, int]],
    target_ids: list[int],
    oov_id: int,
    ok_dep_structures: set[tuple[int, ...]] | None = None,
    oov_percent: int = 75,
) -> bool:
    """GOOD/BAD predicate on the *encoded* record
    (``wiki_and_semeval2sdp.py:267-293``)."""
    if any(t == oov_id for t in target_ids):
        return False
    oov_in_path = sum(1 for t in path_ids if t[0] == oov_id)
    if oov_in_path > int((oov_percent / 100.0) * len(path_ids)):
        return False
    if not path_ids or not target_ids:
        return False
    if ok_dep_structures is not None:
        structure = tuple(t[1] for t in path_ids)
        if structure not in ok_dep_structures:
            return False
    return True
