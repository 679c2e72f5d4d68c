"""Deterministic rule-based tokenizer / POS tagger / dependency parser.

A from-scratch, dependency-free stand-in for the spaCy ``English()`` pipeline
the reference loads as module-global state (``wiki2sdp.py:19-20``,
``semeval_data_helper.py:5-6``). spaCy 0.x is unresurrectable and the sandbox
has no models, so the *semantics* of parsing for this engine are defined by
this module: it is pure Python, fully deterministic, and shared verbatim by
the Ray ``map_batches`` stages and by the single-process oracle the tests
compare against. What matters downstream is exactly what the reference
consumes from spaCy: per-token ``text / idx / pos_ / dep_ / head / is_punct /
like_num`` plus ``noun_chunks`` (``wiki2sdp.py:22-70``).

The grammar is a closed-class heuristic: lexicon-tagged function words,
suffix-tagged content words, one governing verb chain, noun chunks as maximal
nominal runs, preposition/object/subject attachment by local rules. Trees are
acyclic by construction (every non-root head link points strictly left, or at
the root).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

TOKEN_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d[\d.,]*|[^\w\s]")
PUNCT_RE = re.compile(r"^[^\w\s]+$")
NUM_RE = re.compile(r"^\d[\d.,]*$")
SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z0-9])")

DET = frozenset("the a an this that these those every each some any no its his her their our my your".split())
ADP = frozenset(
    "of in on at by with from for to into onto over under about through across against among around behind below beneath beside between beyond during inside near outside toward towards upon within without".split()
)
CCONJ = frozenset("and or but nor yet".split())
PRON = frozenset("he she it they we you i him her them us me who which that".split()) - DET
AUX = frozenset("is are was were be been being am has have had do does did will would can could shall should may might must".split())
NUM_WORDS = frozenset(
    "zero one two three four five six seven eight nine ten eleven twelve twenty thirty forty fifty hundred thousand million billion".split()
)
ADV_LEX = frozenset("very not never always often yesterday today tomorrow here there now then soon quickly slowly carefully recently".split())
# Closed verb lexicon: the synthetic grammar's trigger verbs plus common English
# verbs, so POS tagging stays deterministic without morphology models.
VERB_LEX = frozenset(
    (
        "caused causes cause produced produces produce made makes make created creates create "
        "used uses use contained contains contain held holds hold moved moves move joined joins join "
        "described describes describe discussed discusses discuss entered enters enter arrived arrives arrive "
        "came comes come originated originates originate formed forms form built builds build "
        "released releases release stored stores store carried carries carry delivered delivers deliver "
        "wrote writes write said says say saw sees see went goes go got gets get took takes take "
        "found finds find gave gives give told tells tell became becomes become left leaves leave "
        "put puts bought buys buy sold sells sell sent sends send met meets meet ran runs run "
        "belonged belongs belong comprised comprises comprise included includes include triggered triggers trigger "
        "generated generates generate yielded yields yield visited visits visit covered covers cover "
        "mentioned mentions mention analyzed analyzes analyze shipped ships ship packed packs pack "
        "launched launches launch acquired acquires acquire founded founds found owns owned own "
        "employs employed employ powers powered power fueled fuels fuel sparked sparks spark"
    ).split()
)
ADJ_SUFFIXES = ("ous", "ful", "ive", "al", "ic", "able", "ible", "ish", "less")
VERB_SUFFIXES = ("ed", "ing")

NOMINAL = frozenset(("NOUN", "PROPN", "PRON"))
CHUNKABLE = frozenset(("DET", "ADJ", "NOUN", "PROPN", "PRON", "NUM"))


@dataclass
class Sentence:
    """Columnar parsed sentence — the engine's stand-in for a spaCy ``Doc``.

    Parallel lists; ``head[i]`` is a token index (``head[root] == root``),
    ``idx[i]`` is the char offset (mirrors spaCy ``Token.idx``, used by
    ``find_common_ancestor`` parity — ``wiki2sdp.py:64-70``).
    """

    text: str
    tokens: list[str] = field(default_factory=list)
    idx: list[int] = field(default_factory=list)
    pos: list[str] = field(default_factory=list)
    dep: list[str] = field(default_factory=list)
    head: list[int] = field(default_factory=list)
    is_punct: list[bool] = field(default_factory=list)
    like_num: list[bool] = field(default_factory=list)
    chunks: list[tuple[int, int]] = field(default_factory=list)  # [start, end) spans

    def __len__(self) -> int:
        return len(self.tokens)


def split_sentences(text: str) -> list[str]:
    """Regex sentence splitter for free text (one-line-per-sentence inputs in
    the reference never needed this; interleaved-doc text spans may hold
    multiple sentences)."""
    parts = [p.strip() for p in SENT_SPLIT_RE.split(text)]
    return [p for p in parts if p]


def tokenize(text: str) -> tuple[list[str], list[int]]:
    toks, offs = [], []
    for m in TOKEN_RE.finditer(text):
        toks.append(m.group(0))
        offs.append(m.start())
    return toks, offs


def _tag(tokens: list[str]) -> tuple[list[str], list[bool], list[bool]]:
    pos, is_punct, like_num = [], [], []
    for t in tokens:
        lower = t.lower()
        p = "X"
        punct = bool(PUNCT_RE.match(t))
        num = bool(NUM_RE.match(t)) or lower in NUM_WORDS
        if punct:
            p = "PUNCT"
        elif num:
            p = "NUM"
        elif lower in DET:
            p = "DET"
        elif lower in AUX:
            p = "AUX"
        elif lower in ADP:
            p = "ADP"
        elif lower in CCONJ:
            p = "CCONJ"
        elif lower in PRON:
            p = "PRON"
        elif lower in VERB_LEX:
            p = "VERB"
        elif lower in ADV_LEX or (len(lower) > 3 and lower.endswith("ly")):
            p = "ADV"
        elif lower.endswith(ADJ_SUFFIXES) and len(lower) > 4:
            p = "ADJ"
        elif lower.endswith(VERB_SUFFIXES) and len(lower) > 4:
            p = "VERB"
        elif t[:1].isupper():
            p = "PROPN"
        else:
            p = "NOUN"
        pos.append(p)
        is_punct.append(punct)
        like_num.append(num)
    return pos, is_punct, like_num


def noun_chunk_spans(pos: list[str]) -> list[tuple[int, int]]:
    """Maximal runs of chunkable tags containing >=1 nominal — the engine's
    noun chunker (reference consumes spaCy ``sentence.noun_chunks``,
    ``wiki2sdp.py:34``)."""
    spans = []
    i, n = 0, len(pos)
    while i < n:
        if pos[i] in CHUNKABLE:
            j = i
            while j < n and pos[j] in CHUNKABLE:
                j += 1
            if any(pos[k] in NOMINAL for k in range(i, j)):
                spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def chunk_head(pos: list[str], span: tuple[int, int]) -> int:
    """Head of a chunk = last nominal in the run. By construction its head
    link points outside the span, matching ``noun_chunk_to_head_noun``
    semantics (``wiki2sdp.py:22-29``)."""
    s, e = span
    for k in range(e - 1, s - 1, -1):
        if pos[k] in NOMINAL:
            return k
    return e - 1  # unreachable for spans from noun_chunk_spans


def parse_sentence(text: str) -> Sentence:
    """Tokenize, tag, and attach a single sentence. Deterministic."""
    tokens, offs = tokenize(text)
    pos, is_punct, like_num = _tag(tokens)
    n = len(tokens)
    head = [0] * n
    dep = ["dep"] * n
    sent = Sentence(text, tokens, offs, pos, dep, head, is_punct, like_num)
    if n == 0:
        return sent

    # --- root selection: first main verb (VERB, or AUX not aux-ing a verb) ---
    verbish = [i for i in range(n) if pos[i] in ("VERB", "AUX")]
    aux_of: dict[int, int] = {}
    for i in verbish:
        if pos[i] == "AUX":
            for j in range(i + 1, min(i + 3, n)):
                if pos[j] == "VERB":
                    aux_of[i] = j
                    break
    main_verbs = [i for i in verbish if i not in aux_of]
    if main_verbs:
        root = main_verbs[0]
    else:
        root = next((i for i in range(n) if pos[i] in NOMINAL), 0)
        main_verbs = []
    head[root] = root
    dep[root] = "ROOT"

    def gov_left(i: int) -> int:
        for j in reversed(main_verbs):
            if j < i:
                return j
        return root

    assigned = [False] * n
    assigned[root] = True

    for i, j in aux_of.items():
        head[i] = j
        dep[i] = "aux"
        assigned[i] = True
    for i in main_verbs:
        if i != root:
            head[i] = root
            dep[i] = "conj"
            assigned[i] = True

    # --- noun chunks: internal attachment + head attachment ---
    chunks = noun_chunk_spans(pos)
    sent.chunks = chunks
    chunk_heads: list[int] = []
    subj_taken = False
    for (s, e) in chunks:
        h = chunk_head(pos, (s, e))
        for k in range(s, e):
            if k == h:
                continue
            head[k] = h
            if pos[k] == "DET":
                dep[k] = "det"
            elif pos[k] == "ADJ":
                dep[k] = "amod"
            elif pos[k] == "NUM":
                dep[k] = "nummod"
            else:
                dep[k] = "compound"
            assigned[k] = True
        if not assigned[h]:
            prev = s - 1
            if prev >= 0 and pos[prev] == "ADP":
                head[h] = prev
                dep[h] = "pobj"
            elif prev >= 0 and pos[prev] == "CCONJ" and chunk_heads:
                head[h] = chunk_heads[-1]
                dep[h] = "conj"
            elif h < root and not subj_taken:
                head[h] = root
                dep[h] = "nsubj"
                subj_taken = True
            elif h < root and chunk_heads:
                head[h] = chunk_heads[-1]
                dep[h] = "conj"
            else:
                g = gov_left(h)
                head[h] = g if g != h else root
                dep[h] = "dobj" if g != root or h > root else "nsubj"
            assigned[h] = True
        chunk_heads.append(h)

    # --- remaining tags ---
    for i in range(n):
        if assigned[i]:
            continue
        p = pos[i]
        if p == "ADP":
            tgt = root
            for j in range(i - 1, -1, -1):
                if pos[j] in NOMINAL or j in main_verbs:
                    tgt = j
                    break
            head[i] = tgt if tgt != i else root
            dep[i] = "prep"
        elif p == "ADV":
            g = gov_left(i)
            head[i] = g if g != i else root
            dep[i] = "advmod"
        elif p == "CCONJ":
            prev_heads = [h for h in chunk_heads if h < i]
            head[i] = prev_heads[-1] if prev_heads else root
            dep[i] = "cc"
        elif p == "PUNCT":
            head[i] = root
            dep[i] = "punct"
        else:
            head[i] = root
            dep[i] = "dep"
        assigned[i] = True

    # safety: no self-loop except root
    for i in range(n):
        if i != root and head[i] == i:
            head[i] = root
    return sent
