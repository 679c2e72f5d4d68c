"""Unit tests for the deterministic tokenizer / tagger / dependency parser."""

from relation_extraction_ray.nlp.parser import (
    noun_chunk_spans,
    chunk_head,
    parse_sentence,
    split_sentences,
    tokenize,
)
from relation_extraction_ray.nlp.sdp import dependency_path_to_root
from relation_extraction_ray.sources.synth import corpus_table


def test_tokenize_offsets():
    toks, offs = tokenize("The cat, 42 dogs.")
    assert toks == ["The", "cat", ",", "42", "dogs", "."]
    assert offs == [0, 4, 7, 9, 12, 16]


def test_split_sentences():
    assert split_sentences("A b. C d! E?") == ["A b.", "C d!", "E?"]
    assert split_sentences("one line") == ["one line"]


def test_pos_tagging_basics():
    s = parse_sentence("The red engine caused 42 storms.")
    assert s.pos == ["DET", "NOUN", "NOUN", "VERB", "NUM", "NOUN", "PUNCT"]
    assert s.like_num[4] and s.is_punct[6]


def test_root_and_subject_object():
    s = parse_sentence("The cat chased the dog.")
    root = s.dep.index("ROOT")
    assert s.tokens[root] == "chased"
    cat = s.tokens.index("cat")
    dog = s.tokens.index("dog")
    assert s.dep[cat] == "nsubj" and s.head[cat] == root
    assert s.dep[dog] == "dobj" and s.head[dog] == root


def test_prepositional_attachment():
    s = parse_sentence("The box of the tools held the key.")
    box = s.tokens.index("box")
    of = s.tokens.index("of")
    tools = s.tokens.index("tools")
    assert s.dep[of] == "prep" and s.head[of] == box
    assert s.dep[tools] == "pobj" and s.head[tools] == of


def test_chunk_head_is_last_nominal_and_head_outside():
    s = parse_sentence("The big red engine caused the storm.")
    spans = noun_chunk_spans(s.pos)
    assert len(spans) == 2
    for span in spans:
        h = chunk_head(s.pos, span)
        assert span[0] <= h < span[1]
        # reference semantics (wiki2sdp.py:22-29): head link exits the chunk
        assert not (span[0] <= s.head[h] < span[1]) or s.head[h] == h


def test_trees_are_acyclic_on_corpus():
    docs = corpus_table(50).to_pylist()
    for row in docs:
        for span in row["spans"]:
            if span["kind"] != "text":
                continue
            s = parse_sentence(span["text"])
            roots = [i for i in range(len(s)) if s.head[i] == i]
            assert len(roots) == 1
            for i in range(len(s)):
                path = dependency_path_to_root(s, i)
                assert path[-1] == roots[0]
                assert len(path) <= len(s)


def test_parse_deterministic():
    text = "Zorbal shipped the crate to the warehouse yesterday."
    a, b = parse_sentence(text), parse_sentence(text)
    assert a.pos == b.pos and a.dep == b.dep and a.head == b.head


def test_aux_verb_chain():
    s = parse_sentence("The wixrud was created by Vexzorlun.")
    was = s.tokens.index("was")
    created = s.tokens.index("created")
    assert s.dep[was] == "aux" and s.head[was] == created
    assert s.dep[created] == "ROOT"


def test_empty_and_degenerate():
    assert len(parse_sentence("")) == 0
    s = parse_sentence("...")
    assert s.pos == ["PUNCT", "PUNCT", "PUNCT"]  # one token per punct char
    s = parse_sentence("engine")
    assert s.dep == ["ROOT"]
