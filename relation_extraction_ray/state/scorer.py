"""Numpy GRU relation scorer — the engine's stand-in for the reference's
TF-0.x ``RelEmbed`` model (``relembed.py:45-799``).

The reference pins one in-process TF session holding word/dep/pos embedding
matrices, a GRU cell and a softmax head (``relembed.py:144-170,216-258``),
and classifies padded integer path tensors via ``predict()``
(``relembed.py:726-743``). No TF/torch exists in this sandbox and training
is out of scope (SURVEY.md §3.2), so the engine ships a deterministic
seeded weight fixture (FIXTURES.md F7) and a hand-rolled, fully vectorized
numpy forward pass. Bit-reproducible across runs and parallelism levels:
weights are a pure function of (vocab sizes, seed); masking freezes each
row's hidden state at its true length so padding never changes results.

In the Ray pipeline this runs inside an actor-pool ``map_batches`` stage
with weights built once per actor in ``__init__`` (SURVEY.md T2).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..nlp.labeler import LABELS

D_WORD, D_DEP, D_POS, D_HIDDEN = 32, 8, 8, 64
N_LABELS = len(LABELS)


@dataclass
class ScorerWeights:
    word_emb: np.ndarray  # [Vw, D_WORD]
    dep_emb: np.ndarray   # [Vd, D_DEP]
    pos_emb: np.ndarray   # [Vp, D_POS]
    w_z: np.ndarray
    u_z: np.ndarray
    b_z: np.ndarray
    w_r: np.ndarray
    u_r: np.ndarray
    b_r: np.ndarray
    w_h: np.ndarray
    u_h: np.ndarray
    b_h: np.ndarray
    w_out: np.ndarray     # [D_HIDDEN, N_LABELS]
    b_out: np.ndarray


def weights_fixture(vocab_size: int, dep_size: int, pos_size: int, seed: int = 7) -> ScorerWeights:
    """Deterministic weight bundle — pure function of shapes + seed."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, vocab_size, dep_size, pos_size]))

    def mat(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    d_in = D_WORD + D_DEP + D_POS
    return ScorerWeights(
        word_emb=mat(vocab_size, D_WORD),
        dep_emb=mat(dep_size, D_DEP),
        pos_emb=mat(pos_size, D_POS),
        w_z=mat(d_in, D_HIDDEN), u_z=mat(D_HIDDEN, D_HIDDEN), b_z=np.zeros(D_HIDDEN, np.float32),
        w_r=mat(d_in, D_HIDDEN), u_r=mat(D_HIDDEN, D_HIDDEN), b_r=np.zeros(D_HIDDEN, np.float32),
        w_h=mat(d_in, D_HIDDEN), u_h=mat(D_HIDDEN, D_HIDDEN), b_h=np.zeros(D_HIDDEN, np.float32),
        w_out=mat(D_HIDDEN, N_LABELS), b_out=np.zeros(N_LABELS, np.float32),
    )


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def pad_paths(
    word_ids: list[list[int]], dep_ids: list[list[int]], pos_ids: list[list[int]]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Densify ragged id lists to zero-padded [B, T] int32 + lengths [B]
    (reference batch layout: ``data_handler.py:106-124``)."""
    b = len(word_ids)
    lengths = np.array([len(p) for p in word_ids], dtype=np.int32)
    t = max(1, int(lengths.max()) if b else 1)
    w = np.zeros((b, t), dtype=np.int32)
    d = np.zeros((b, t), dtype=np.int32)
    p = np.zeros((b, t), dtype=np.int32)
    for i in range(b):
        n = lengths[i]
        w[i, :n] = word_ids[i]
        d[i, :n] = dep_ids[i]
        p[i, :n] = pos_ids[i]
    return w, d, p, lengths


def score_batch(
    wts: ScorerWeights,
    word_ids: np.ndarray,
    dep_ids: np.ndarray,
    pos_ids: np.ndarray,
    lengths: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched GRU forward → (pred_label_idx [B] int32, prob [B, N] float32).

    Rows with length 0 get uniform probabilities.
    """
    b, t = word_ids.shape
    x = np.concatenate(
        [wts.word_emb[word_ids], wts.dep_emb[dep_ids], wts.pos_emb[pos_ids]], axis=-1
    )  # [B, T, d_in]
    h = np.zeros((b, D_HIDDEN), dtype=np.float32)
    for step in range(t):
        xt = x[:, step, :]
        z = _sigmoid(xt @ wts.w_z + h @ wts.u_z + wts.b_z)
        r = _sigmoid(xt @ wts.w_r + h @ wts.u_r + wts.b_r)
        hc = np.tanh(xt @ wts.w_h + (r * h) @ wts.u_h + wts.b_h)
        h_new = (1.0 - z) * h + z * hc
        mask = (step < lengths)[:, None]
        h = np.where(mask, h_new, h)
    logits = h @ wts.w_out + wts.b_out
    logits -= logits.max(axis=1, keepdims=True)
    e = np.exp(logits)
    probs = (e / e.sum(axis=1, keepdims=True)).astype(np.float32)
    return probs.argmax(axis=1).astype(np.int32), probs
