"""Operator-level tests for SDP extraction, vocab, encoding, filters
(reference semantics citations in the module docstrings)."""

import pytest

from relation_extraction_ray.nlp.parser import parse_sentence
from relation_extraction_ray.nlp.sdp import (
    SPECIALS,
    dependency_path_to_root,
    find_common_ancestor,
    finalize_vocab,
    is_ok_sdp,
    post_process_path,
    sdp_between,
    sentence_to_sdps,
    vocab2idx,
)
from relation_extraction_ray.nlp.labeler import label_path, lookup_inverse_relation


def heads(sent):
    from relation_extraction_ray.nlp.parser import chunk_head

    return [chunk_head(sent.pos, sp) for sp in sent.chunks]


def test_case3_common_ancestor_z():
    # X <- ... <- Z -> ... -> Y with Z = the verb
    s = parse_sentence("The cat chased the dog.")
    x, y = heads(s)
    sdp = sdp_between(s, x, y)
    words = [t[0] for t in sdp]
    assert words[0] == "<X>" and words[-1] == "<Y>"
    assert "chased" in words  # Z kept exactly once
    assert words.count("chased") == 1
    deps = [t[1] for t in sdp]
    assert deps == ["nsubj", "ROOT", "dobj"]


def test_case2_x_is_ancestor():
    # 'tools' hangs under 'box' via of-pobj: X (box) is the common ancestor
    s = parse_sentence("The box of the tools held the key.")
    box = s.tokens.index("box")
    tools = s.tokens.index("tools")
    sdp = sdp_between(s, box, tools)
    words = [t[0] for t in sdp]
    assert words == ["<X>", "of", "<Y>"]
    # orientation is X -> ... -> Y even though the walk was rooted at Y
    assert sdp[0][1] == "nsubj" and sdp[-1][1] == "pobj"


def test_case2_y_is_ancestor():
    s = parse_sentence("The box of the tools held the key.")
    box = s.tokens.index("box")
    tools = s.tokens.index("tools")
    # swap: X deeper than Y -> single chain, no reversal
    sdp = sdp_between(s, tools, box)
    words = [t[0] for t in sdp]
    assert words == ["<X>", "of", "<Y>"]
    assert sdp[0][1] == "pobj" and sdp[-1][1] == "nsubj"


def test_case1_no_common_ancestor_skips():
    s = parse_sentence("The cat chased the dog.")
    # sever the tree: give 'dog' its own root to simulate a parse island
    dog = s.tokens.index("dog")
    s.head[dog] = dog
    x, y = s.tokens.index("cat"), dog
    assert sdp_between(s, x, y) is None
    assert list(sentence_to_sdps(s)) == []  # extractor skips case (1)


def test_endpoint_placeholders_and_include_ends():
    s = parse_sentence("The engine caused the storm.")
    x, y = heads(s)
    with_ends = sdp_between(s, x, y, include_ends=True)
    assert with_ends[0][0] == "engine" and with_ends[-1][0] == "storm"
    without = sdp_between(s, x, y)
    assert without[0][0] == "<X>" and without[-1][0] == "<Y>"
    # dep/pos of the endpoints survive substitution (wiki_and_semeval2sdp.py:141-143)
    assert without[0][1:] == with_ends[0][1:]


def test_num_and_punct_normalization_on_path():
    s = parse_sentence("The engine caused 42 storms.")
    # 42 is inside the object chunk -> nummod under 'storms'; path word for a
    # separate pair would use <NUM>; verify smart text via include path through NUM chunk
    from relation_extraction_ray.nlp.sdp import smart_token_text

    i = s.tokens.index("42")
    assert smart_token_text(s, i) == "<NUM>"
    j = s.tokens.index(".")
    assert smart_token_text(s, j) == "<PUNCT>"


def test_post_process_drops_punct():
    path = [("<X>", "nsubj", "NOUN"), ("<PUNCT>", "punct", "PUNCT"), ("<Y>", "dobj", "NOUN")]
    assert post_process_path(path) == [path[0], path[2]]


def test_length_bounds():
    s = parse_sentence("The cat chased the dog.")
    assert len(list(sentence_to_sdps(s, min_len=1, max_len=7))) == 1
    assert list(sentence_to_sdps(s, min_len=4, max_len=7)) == []
    assert list(sentence_to_sdps(s, min_len=1, max_len=2)) == []


def test_max_pairs_cap():
    s = parse_sentence("The cat chased the dog near the barn in the field.")
    all_sdps = list(sentence_to_sdps(s, max_pairs=None, max_len=20))
    capped = list(sentence_to_sdps(s, max_pairs=1, max_len=20))
    assert len(capped) <= 1 <= len(all_sdps)


def test_find_common_ancestor_first_match_order():
    s = parse_sentence("The cat chased the dog.")
    x, y = heads(s)
    px = dependency_path_to_root(s, x)
    py = dependency_path_to_root(s, y)
    root = s.dep.index("ROOT")
    assert find_common_ancestor(s, px, py) == root


def test_finalize_vocab_order_specials_and_dist():
    counts = {"b": 5, "a": 5, "c": 2, "d": 1}
    vocab, v2i, dist = finalize_vocab(counts)
    # ties broken (count desc, token asc); specials appended in fixed order
    assert vocab == ["a", "b", "c", "d"] + SPECIALS
    assert vocab[-5:] == ["<OOV>", "<X>", "<Y>", "<NUM>", "<PUNCT>"]
    assert abs(sum(dist) - 1.0) < 1e-12
    # oov pseudo-count 1 for each of the 5 specials (wiki2sdp.py:224-226)
    assert dist[-1] == pytest.approx(1.0 / (5 + 5 + 2 + 1 + 5))


def test_finalize_vocab_min_count_and_limit():
    counts = {"a": 10, "b": 5, "c": 2, "d": 1}
    vocab, _, _ = finalize_vocab(counts, min_count=2)
    assert vocab[:3] == ["a", "b", "c"]  # cut at first count < 2
    vocab, _, _ = finalize_vocab(counts, vocab_limit=2, min_count=2)  # limit trumps
    assert vocab[:2] == ["a", "b"] and len(vocab) == 7


def test_vocab2idx_oov_fallback():
    _, v2i, _ = finalize_vocab({"a": 1})
    assert vocab2idx("a", v2i) == 0
    assert vocab2idx("zzz", v2i) == v2i["<OOV>"]


def test_is_ok_sdp_rules():
    oov = 99
    ok = [(1, 2, 3), (4, 5, 6)]
    assert is_ok_sdp(ok, [7, 8], oov)
    assert not is_ok_sdp(ok, [oov, 8], oov)  # OOV target
    assert not is_ok_sdp(ok, [7, oov], oov)
    assert not is_ok_sdp([], [7, 8], oov)  # empty path
    # >75% OOV words in path: 4 of 5 OOV -> 4 > int(0.75*5)=3 -> rejected
    bad_path = [(oov, 1, 1)] * 4 + [(2, 1, 1)]
    assert not is_ok_sdp(bad_path, [7, 8], oov)
    # 3 of 4 OOV sits exactly at int(0.75*4)=3; reference uses strict > so it passes
    at_threshold = [(oov, 1, 1)] * 3 + [(2, 1, 1)]
    assert is_ok_sdp(at_threshold, [7, 8], oov)
    borderline = [(oov, 1, 1), (2, 1, 1)]
    assert is_ok_sdp(borderline, [7, 8], oov)
    # dep-structure whitelist (wiki_and_semeval2sdp.py:289-293)
    assert is_ok_sdp(ok, [7, 8], oov, ok_dep_structures={(2, 5)})
    assert not is_ok_sdp(ok, [7, 8], oov, ok_dep_structures={(9, 9)})


def test_labeler_direction_passive_and_guard():
    assert label_path(["<X>", "caused", "<Y>"]) == "Cause-Effect(e1,e2)"
    assert label_path(["<X>", "caused", "by", "<Y>"]) == "Cause-Effect(e2,e1)"
    assert label_path(["<X>", "moved", "into", "<Y>"]) == "Entity-Destination(e1,e2)"
    # guarded prep outside template set -> Other
    assert label_path(["<X>", "caused", "in", "<Y>"]) == "Other"
    assert label_path(["<X>", "banana", "<Y>"]) == "Other"


def test_inverse_relation():
    assert lookup_inverse_relation("Cause-Effect(e1,e2)") == "Cause-Effect(e2,e1)"
    assert lookup_inverse_relation("Other") == "Other"
