"""Distant-supervision relation labeler over SDP word sequences.

The reference's supervised path classifies SDPs into the 19 SemEval-2010
Task-8 labels (``semeval_data_helper.py:208-229``); its unsupervised/distant
path labels pairs from side information (Brown-cluster pair ids, RelEmbed
Clustered notebooks, SURVEY.md M18). This module is the engine's
deterministic distant-supervision labeler: a broadcast trigger-lexicon
lookup (small static side, map-side join — no shuffle) that maps the verb
lexeme on the path to a directed relation label, with preposition guards and
passive (``by``) direction flipping. ``Other`` for anything unmatched —
mirroring the reference's treatment of ``Other`` as the non-relation class.
"""

from __future__ import annotations

LABELS = [
    "Cause-Effect(e1,e2)",
    "Cause-Effect(e2,e1)",
    "Product-Producer(e1,e2)",
    "Product-Producer(e2,e1)",
    "Entity-Origin(e1,e2)",
    "Entity-Origin(e2,e1)",
    "Instrument-Agency(e1,e2)",
    "Instrument-Agency(e2,e1)",
    "Component-Whole(e1,e2)",
    "Component-Whole(e2,e1)",
    "Content-Container(e1,e2)",
    "Content-Container(e2,e1)",
    "Entity-Destination(e1,e2)",
    "Entity-Destination(e2,e1)",
    "Member-Collection(e1,e2)",
    "Member-Collection(e2,e1)",
    "Message-Topic(e1,e2)",
    "Message-Topic(e2,e1)",
    "Other",
]
OTHER = "Other"
LABEL2INT = {lab: i for i, lab in enumerate(LABELS)}

# trigger lexeme -> (relation, direction when X precedes Y in active voice,
#                    preposition set allowed on the path besides 'by')
TRIGGER2REL: dict[str, tuple[str, str, frozenset[str]]] = {
    # Cause-Effect: X causes Y -> e1 is Cause
    "caused": ("Cause-Effect", "(e1,e2)", frozenset()),
    "triggered": ("Cause-Effect", "(e1,e2)", frozenset()),
    "sparked": ("Cause-Effect", "(e1,e2)", frozenset()),
    # Product-Producer: X produces Y -> e2 is the Product => (e2,e1)
    "produced": ("Product-Producer", "(e2,e1)", frozenset()),
    "created": ("Product-Producer", "(e2,e1)", frozenset()),
    "made": ("Product-Producer", "(e2,e1)", frozenset()),
    # Entity-Origin: X came from Y -> e1 is the Entity
    "came": ("Entity-Origin", "(e1,e2)", frozenset({"from"})),
    "originated": ("Entity-Origin", "(e1,e2)", frozenset({"from"})),
    # Instrument-Agency: X(agent) used Y(instrument) -> e2 is the Instrument
    "used": ("Instrument-Agency", "(e2,e1)", frozenset()),
    "wielded": ("Instrument-Agency", "(e2,e1)", frozenset()),
    # Component-Whole: X(whole) comprised Y(component) -> e2 is the Component
    "comprised": ("Component-Whole", "(e2,e1)", frozenset()),
    "included": ("Component-Whole", "(e2,e1)", frozenset()),
    # Content-Container: X(container) held Y(content) -> e2 is the Content
    "held": ("Content-Container", "(e2,e1)", frozenset()),
    "stored": ("Content-Container", "(e2,e1)", frozenset()),
    # Entity-Destination: X moved into Y -> e1 is the Entity
    "moved": ("Entity-Destination", "(e1,e2)", frozenset({"into", "to"})),
    "entered": ("Entity-Destination", "(e1,e2)", frozenset({"into", "to"})),
    "shipped": ("Entity-Destination", "(e1,e2)", frozenset({"into", "to"})),
    # Member-Collection: X joined Y -> e1 is the Member
    "joined": ("Member-Collection", "(e1,e2)", frozenset()),
    "belonged": ("Member-Collection", "(e1,e2)", frozenset({"to"})),
    # Message-Topic: X(message) described Y(topic) -> e1 is the Message
    "described": ("Message-Topic", "(e1,e2)", frozenset()),
    "discussed": ("Message-Topic", "(e1,e2)", frozenset()),
}

# prepositions that, when present on a path, disqualify a trigger unless the
# trigger's template allows them (distractor PP attachment guard)
_GUARD_PREPS = frozenset(
    "of in on at by with from for to into onto over under about near inside outside within".split()
)


def _flip(direction: str) -> str:
    return "(e2,e1)" if direction == "(e1,e2)" else "(e1,e2)"


def label_path(words: list[str]) -> str:
    """SDP word sequence (with ``<X>/<Y>`` endpoints) → directed label.

    Deterministic: first trigger lexeme wins; any guarded preposition outside
    the trigger's allowed set rejects (→ Other); ``by`` flips direction
    (passive voice).
    """
    trig = None
    for w in words:
        if w in TRIGGER2REL:
            trig = w
            break
    if trig is None:
        return OTHER
    rel, direction, allowed = TRIGGER2REL[trig]
    flip = False
    for w in words:
        if w in _GUARD_PREPS:
            if w == "by":
                flip = True
            elif w not in allowed:
                return OTHER
    return f"{rel}{_flip(direction) if flip else direction}"


def lookup_inverse_relation(label: str) -> str:
    """``Rel(e1,e2) ↔ Rel(e2,e1)`` flip, ``Other`` fixed
    (``data_helper.py:70-80``)."""
    if label == OTHER:
        return label
    if label.endswith("(e1,e2)"):
        return label[: -len("(e1,e2)")] + "(e2,e1)"
    return label[: -len("(e2,e1)")] + "(e1,e2)"


def directional_to_bidirectional(label: str) -> str:
    """Collapse ``Rel(ei,ej)`` → ``Rel`` (``experiment_helper.py:91-117``)."""
    cut = label.find("(")
    return label if cut < 0 else label[:cut]
