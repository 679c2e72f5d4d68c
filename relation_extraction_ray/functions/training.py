"""Training-side operators (SURVEY.md §2.5-2.6): deterministic splits,
target/unigram distributions, negative sampling, phrase embeddings +
top-k nearest, entropy ranking, id↔token decode, embedding-table and
cluster-table broadcasts.

Everything is deterministic under parallelism: per-row randomness derives
from stable blake2b hashes of row keys (never global RNG state), so any
retry / repartition / cluster size produces identical output — the
property the reference gets from single-process seeded numpy
(``data_handler.py:151-229``) and we must keep distributed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

from ..config import KGConfig
from ..state.scorer import pad_paths, score_batch, weights_fixture

# ---------------------------------------------------------------------------
# O2: deterministic split (reference: seeded shuffle + tail slice,
# data_handler.py:32-34,55-60 — here hash-based so it's stable at any
# parallelism and needs no global shuffle)
# ---------------------------------------------------------------------------


def _stable_unit(key: str) -> float:
    h = hashlib.blake2b(key.encode(), digest_size=8).digest()
    return int.from_bytes(h, "big") / 2**64


def split_train_valid(
    ds: ray.data.Dataset, valid_percent: float = 0.1, seed: int = 42, key_cols: tuple[str, ...] = ("doc_id", "sent_id")
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    def in_valid(row) -> bool:
        key = f"{seed}:" + ":".join(str(row[c]) for c in key_cols)
        return _stable_unit(key) < valid_percent

    return ds.filter(lambda r: not in_valid(r)), ds.filter(in_valid)


# ---------------------------------------------------------------------------
# A2/A3/A5: distributions + global max length
# ---------------------------------------------------------------------------


def target_distribution(encoded: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Unigram distribution over target entity ids (A2,
    ``data_handler.py:42-50``): per-batch partial counts → groupby → small
    (id, prob) arrays."""

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for pair in batch.column("target_ids").to_pylist():
            for t in pair:
                c[t] += 1
        return pa.Table.from_pydict(
            {"id": pa.array(list(c.keys()), pa.int32()), "n": pa.array(list(c.values()), pa.int64())}
        )

    rows = (
        encoded.map_batches(partial, batch_format="pyarrow")
        .groupby("id")
        .sum("n")
        .take_all()
    )
    rows.sort(key=lambda r: r["id"])
    ids = np.array([r["id"] for r in rows], dtype=np.int32)
    counts = np.array([r["sum(n)"] for r in rows], dtype=np.float64)
    return ids, counts / counts.sum()


def max_seq_len(encoded: ray.data.Dataset) -> int:
    """A3 (``data_handler.py:36``): global max path length."""
    return int(encoded.max("length"))


def distribution_to_power(dist: np.ndarray, power: float = 0.75) -> np.ndarray:
    """A5 (``data_handler.py:432-436``): dist^p renormalized."""
    p = np.asarray(dist, dtype=np.float64) ** power
    return p / p.sum()


# ---------------------------------------------------------------------------
# O7: negative sampling — per-row stable randomness, vectorized inverse-CDF
# ---------------------------------------------------------------------------


def negative_samples(
    encoded: ray.data.Dataset,
    ids: np.ndarray,
    dist: np.ndarray,
    neg_per: int = 5,
    seed: int = 42,
    corrupt: str = "target",
) -> ray.data.Dataset:
    """Negative sampling (O7).  ``corrupt="target"``
    (``data_handler.py:179-188``): negative #0 is the reversed target pair
    (``:171-178``), the rest draw one replaced target side from the powered
    unigram distribution.  ``corrupt="word"`` (``:190-212``): each negative
    replaces one random path-word position instead, emitting a
    ``neg_word_ids`` column.  All draws via inverse-CDF on stable
    per-(row, k) hashes — deterministic at any parallelism."""
    cdf = np.cumsum(np.asarray(dist, dtype=np.float64))
    ids_arr = np.asarray(ids, dtype=np.int32)
    ref = ray.put((ids_arr, cdf))

    assert corrupt in ("target", "word")

    class NegSample:
        def __init__(self) -> None:
            self.ids, self.cdf = ray.get(ref)

        def _draw(self, key: str) -> int:
            u = _stable_unit(key)
            return int(self.ids[np.searchsorted(self.cdf, u, side="right").clip(0, len(self.ids) - 1)])

        def __call__(self, batch: pa.Table) -> pa.Table:
            out: dict[str, list] = {
                k: [] for k in ("doc_id", "sent_id", "pair_id", "neg_idx", "neg_target", "neg_word_ids")
            }
            for doc_id, sent_id, pair_id, target, word_ids in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("sent_id").to_pylist(),
                batch.column("pair_id").to_pylist(),
                batch.column("target_ids").to_pylist(),
                batch.column("word_ids").to_pylist(),
            ):
                x, y = target
                for k in range(neg_per):
                    key = f"{seed}:{doc_id}:{sent_id}:{pair_id}:{k}"
                    neg, neg_words = [x, y], list(word_ids)
                    if corrupt == "target":
                        if k == 0:
                            neg = [y, x]  # reversed pair is always the first negative
                        else:
                            cand = self._draw(key + ":a")
                            neg = [cand, y] if _stable_unit(key + ":b") < 0.5 else [x, cand]
                    else:  # word corruption: replace one path position
                        if neg_words:
                            pos = int(_stable_unit(key + ":p") * len(neg_words)) % len(neg_words)
                            neg_words[pos] = self._draw(key + ":w")
                    out["doc_id"].append(doc_id)
                    out["sent_id"].append(sent_id)
                    out["pair_id"].append(pair_id)
                    out["neg_idx"].append(k)
                    out["neg_target"].append(neg)
                    out["neg_word_ids"].append(neg_words)
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(out["doc_id"], pa.string()),
                    "sent_id": pa.array(out["sent_id"], pa.int32()),
                    "pair_id": pa.array(out["pair_id"], pa.int32()),
                    "neg_idx": pa.array(out["neg_idx"], pa.int32()),
                    "neg_target": pa.array(out["neg_target"], pa.list_(pa.int32())),
                    "neg_word_ids": pa.array(out["neg_word_ids"], pa.list_(pa.int32())),
                }
            )

    return encoded.map_batches(NegSample, batch_format="pyarrow", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# O5/O6: phrase embeddings, top-k nearest, entropy ranking
# ---------------------------------------------------------------------------


class EmbedStage:
    """Actor-pool: encoded paths → GRU final hidden state (the phrase
    embedding the reference probes with ``nearest_phrases``,
    ``relembed.py:610-625``) + per-row prediction entropy (O6)."""

    def __init__(self, sizes_ref, cfg: KGConfig) -> None:
        vw, vd, vp = ray.get(sizes_ref)
        self.wts = weights_fixture(vw, vd, vp, seed=cfg.scorer_seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.string()),
                    "sent_id": pa.array([], pa.int32()),
                    "pair_id": pa.array([], pa.int32()),
                    "embedding": pa.array([], pa.list_(pa.float32())),
                    "entropy": pa.array([], pa.float64()),
                }
            )
        w, d, p, lengths = pad_paths(
            batch.column("word_ids").to_pylist(),
            batch.column("dep_ids").to_pylist(),
            batch.column("pos_ids").to_pylist(),
        )
        _, probs = score_batch(self.wts, w, d, p, lengths)
        # re-run forward to capture hidden state: score_batch returns probs
        # only; recompute h from logits isn't possible, so embed = logits
        # pre-softmax would lose D; use probs entropy + hidden proxy below.
        from ..state.scorer import D_HIDDEN, _sigmoid  # noqa: F401

        ent = -(probs * np.log(np.clip(probs, 1e-12, None))).sum(axis=1)
        hidden = _gru_hidden(self.wts, w, d, p, lengths)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "sent_id": batch.column("sent_id"),
                "pair_id": batch.column("pair_id"),
                "embedding": pa.array([row.tolist() for row in hidden], pa.list_(pa.float32())),
                "entropy": pa.array(ent.astype(np.float64), pa.float64()),
            }
        )


def _gru_hidden(wts, w, d, p, lengths) -> np.ndarray:
    """Final GRU hidden state (same recurrence as score_batch)."""
    from ..state.scorer import _sigmoid

    b, t = w.shape
    x = np.concatenate([wts.word_emb[w], wts.dep_emb[d], wts.pos_emb[p]], axis=-1)
    h = np.zeros((b, wts.d_hidden), dtype=np.float32)
    for step in range(t):
        xt = x[:, step, :]
        z = _sigmoid(xt @ wts.w_z + h @ wts.u_z + wts.b_z)
        r = _sigmoid(xt @ wts.w_r + h @ wts.u_r + wts.b_r)
        hc = np.tanh(xt @ wts.w_h + (r * h) @ wts.u_h + wts.b_h)
        h_new = (1.0 - z) * h + z * hc
        h = np.where((step < lengths)[:, None], h_new, h)
    return h


def phrase_embeddings(encoded: ray.data.Dataset, vocabs, cfg: KGConfig | None = None) -> ray.data.Dataset:
    (wv, _, _), (dv, _, _), (pv, _, _) = vocabs
    sizes_ref = ray.put((len(wv), len(dv), len(pv)))
    return encoded.map_batches(
        EmbedStage,
        fn_constructor_kwargs={"sizes_ref": sizes_ref, "cfg": cfg or KGConfig()},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def nearest_phrases(embeddings: ray.data.Dataset, query_vec: np.ndarray, k: int = 10) -> ray.data.Dataset:
    """O5 (``relembed.py:610-625``): top-k rows by inner product with a
    query embedding — score per batch, global sort desc + limit."""
    q = np.asarray(query_vec, dtype=np.float64)
    ref = ray.put(q)

    class Score:
        def __init__(self) -> None:
            self.q = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            sims = m @ self.q if len(m) else np.zeros(0)
            return pa.Table.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "sent_id": batch.column("sent_id"),
                    "pair_id": batch.column("pair_id"),
                    "sim": pa.array(sims, pa.float64()),
                }
            )

    return (
        embeddings.map_batches(Score, batch_format="pyarrow", concurrency=(1, 4))
        .sort("sim", descending=True)
        .limit(k)
    )


def entropy_ranked(embeddings: ray.data.Dataset, top_n: int = 100) -> ray.data.Dataset:
    """O6: active-learning ordering — highest-entropy rows first."""
    return embeddings.select_columns(["doc_id", "sent_id", "pair_id", "entropy"]).sort(
        "entropy", descending=True
    ).limit(top_n)


# ---------------------------------------------------------------------------
# M16: decode; S9/S10: embedding-table + cluster-table broadcasts; M18
# ---------------------------------------------------------------------------


def decode_paths(encoded: ray.data.Dataset, word_vocab: list[str]) -> ray.data.Dataset:
    """ids → tokens (M16 ``sequences_to_sentences``); inverse vocab is a
    broadcast list (id == position)."""
    ref = ray.put(list(word_vocab))

    class Decode:
        def __init__(self) -> None:
            self.vocab = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            decoded = [
                [self.vocab[i] for i in ids] for ids in batch.column("word_ids").to_pylist()
            ]
            return pa.Table.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "sent_id": batch.column("sent_id"),
                    "pair_id": batch.column("pair_id"),
                    "decoded_words": pa.array(decoded, pa.list_(pa.string())),
                }
            )

    return encoded.map_batches(Decode, batch_format="pyarrow", concurrency=(1, 4))


def read_word2vec_binary(
    path: str, vocab: set[str] | None = None, limit: int | None = None
) -> dict[str, np.ndarray]:
    """GoogleNews-format word2vec ``.bin`` reader (S9 — the reference loads
    this with gensim in RelEmbed_semeval.ipynb cell 9; the format is
    public: ``"<n> <dim>\\n"`` header, then per entry the word's bytes
    terminated by ``' '`` followed by ``dim`` raw little-endian float32s).

    ``vocab`` restricts which words are kept (the 3M×300 full table is
    ~3.6 GB — prune at the read, never after); ``limit`` caps entries
    scanned.  Returns word → float32 vector, ready for
    :func:`embedding_init` and a single ``ray.put`` broadcast."""
    out: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        header = f.readline().decode("utf-8")
        n, dim = (int(x) for x in header.split())
        vec_bytes = 4 * dim
        scan = n if limit is None else min(n, limit)
        for _ in range(scan):
            chars = bytearray()
            while True:
                c = f.read(1)
                if not c or c == b" ":
                    break
                if c != b"\n":  # some files newline-prefix entries
                    chars.extend(c)
            if not c:
                break
            word = chars.decode("utf-8", errors="replace")
            buf = f.read(vec_bytes)
            if len(buf) < vec_bytes:
                break
            if vocab is None or word in vocab:
                out[word] = np.frombuffer(buf, dtype="<f4").copy()
    return out


def write_word2vec_binary(path: str, table: dict[str, np.ndarray]) -> None:
    """Inverse of :func:`read_word2vec_binary` (fixture/export helper)."""
    dims = {len(v) for v in table.values()}
    assert len(dims) == 1, "all vectors must share one dimension"
    dim = dims.pop()
    with open(path, "wb") as f:
        f.write(f"{len(table)} {dim}\n".encode())
        for word, vec in table.items():
            f.write(word.encode("utf-8") + b" ")
            f.write(np.asarray(vec, dtype="<f4").tobytes())


def embedding_init(vocab: list[str], table: dict[str, np.ndarray], dim: int, seed: int = 7) -> np.ndarray:
    """S9 (word2vec init, RelEmbed_semeval.ipynb cell 9): deterministic
    random matrix with rows overwritten for in-table tokens."""
    rng = np.random.default_rng(seed)
    mat = (rng.standard_normal((len(vocab), dim)) * 0.1).astype(np.float32)
    for i, tok in enumerate(vocab):
        vec = table.get(tok)
        if vec is not None:
            mat[i] = np.asarray(vec, dtype=np.float32)
    return mat


def skipgram_pairs(
    parsed: ray.data.Dataset, w2i: dict[str, int], window: int = 4
) -> ray.data.Dataset:
    """DISTRIBUTED (center, context) skip-gram pair generation over parsed
    records' full sentences — the data half of the self-trained word2vec
    stand-in (the real reference init reads externally-trained GoogleNews
    vectors, RelEmbed_semeval.ipynb cell 9; no such file can ship in this
    sandbox, so the engine trains its own vectors on the task corpus).
    Tokenization matches the vocab build exactly (``parse_sentence`` +
    lowercase + OOV fallback), so every id indexes the model's word table.
    ``key`` orders pairs deterministically regardless of block layout."""
    from ..nlp.parser import parse_sentence
    from ..nlp.sdp import vocab2idx

    ref = ray.put(dict(w2i))

    class Pairs:
        def __init__(self) -> None:
            self.w2i = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            centers: list[int] = []
            contexts: list[int] = []
            keys: list[int] = []
            for sid, text in zip(
                batch.column("sent_id").to_pylist(), batch.column("text").to_pylist()
            ):
                toks = parse_sentence(text).tokens
                ids = [vocab2idx(t.lower(), self.w2i) for t in toks]
                for i, c in enumerate(ids):
                    for j in range(max(0, i - window), min(len(ids), i + window + 1)):
                        if j != i:
                            centers.append(c)
                            contexts.append(ids[j])
                            keys.append((sid << 20) | (i << 8) | (j & 0xFF))
            return pa.Table.from_pydict(
                {
                    "key": pa.array(keys, pa.int64()),
                    "center": pa.array(centers, pa.int32()),
                    "context": pa.array(contexts, pa.int32()),
                },
                schema=pa.schema(
                    [("key", pa.int64()), ("center", pa.int32()), ("context", pa.int32())]
                ),
            )

    return parsed.map_batches(Pairs, batch_format="pyarrow", concurrency=(1, 8))


def train_skipgram(
    centers: np.ndarray,
    contexts: np.ndarray,
    vocab_size: int,
    dim: int = 32,
    epochs: int = 3,
    neg: int = 5,
    lr: float = 0.05,
    seed: int = 7,
    batch_size: int = 1024,
    return_context: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Skip-gram with negative sampling (word2vec SGNS, Mikolov et al.
    2013) — vectorized numpy minibatch SGD, deterministic (seeded RNG,
    fixed pair order).  Driver-side by design: the PAIR GENERATION is
    distributed (:func:`skipgram_pairs`); at wiki scale embedding
    pretraining goes through ``fit_alternating_distributed``'s NEG
    objective instead.  Returns the input-side vectors [V, dim], or
    ``(w_in, w_out)`` with ``return_context=True`` (the ``w_in·w_out``
    score is the model's actual pair objective — input·input cosine of
    co-occurring words is syntagmatic and can be legitimately negative,
    so intrinsic-quality probes need both matrices)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, vocab_size, dim, 15485863]))
    w_in = ((rng.random((vocab_size, dim)) - 0.5) / dim).astype(np.float64)
    w_out = np.zeros((vocab_size, dim), dtype=np.float64)
    counts = np.bincount(contexts, minlength=vocab_size).astype(np.float64)
    noise = distribution_to_power(np.maximum(counts, 1e-9) / max(1.0, counts.sum()), 0.75)
    noise_cdf = np.cumsum(noise)
    bs = _stable_batch_size(batch_size, vocab_size)
    for epoch in range(epochs):
        alpha = lr * (1.0 - epoch / max(1, epochs))  # linear decay per epoch
        _sgns_epoch(w_in, w_out, centers, contexts, noise_cdf, alpha, rng, neg, bs)
    if return_context:
        return w_in.astype(np.float32), w_out.astype(np.float32)
    return w_in.astype(np.float32)


def _stable_batch_size(batch_size: int, vocab_size: int) -> int:
    """Cap the SGNS minibatch so hot-row gradient collisions stay O(1).

    The batched kernel applies every same-row gradient in a minibatch at
    the SAME stale weights (``np.add.at`` sum); with a small vocabulary the
    hottest rows collect ``batch×(neg+1)×p_hot`` collisions per batch and
    the summed update overshoots the logistic optimum — oscillation
    divergence.  Measured on a 461-word / 2.25M-pair synthetic corpus:
    batch 1024 and 256 overflow to NaN within one epoch, batch 64 is
    stable.  ``vocab // 8`` keeps the measured-stable ratio with margin; a
    no-op for ``vocab ≥ 8×batch`` — the SemEval fixture path (vocab 9192,
    default batch 1024) keeps its exact historical outputs.

    Note the cap changes only where minibatch BOUNDARIES fall: the rng
    stream (one ``permutation`` + sequential ``random((b, neg))`` draws)
    consumes identical values in identical order, so results stay
    deterministic under any cap."""
    return min(batch_size, max(16, vocab_size // 8))


def _sgns_epoch(
    w_in: np.ndarray,
    w_out: np.ndarray,
    centers: np.ndarray,
    contexts: np.ndarray,
    noise_cdf: np.ndarray,
    alpha: float,
    rng: np.random.Generator,
    neg: int,
    batch_size: int,
) -> None:
    """One SGNS epoch, updating (w_in, w_out) in place — the shared kernel
    of the driver-side and sharded trainers (identical rng call sequence to
    the pre-refactor loop, so :func:`train_skipgram` outputs are unchanged)."""
    vocab_size, dim = w_in.shape
    n = len(centers)
    order = rng.permutation(n)
    for lo in range(0, n, batch_size):
        idx = order[lo : lo + batch_size]
        c, o = centers[idx], contexts[idx]
        b = len(c)
        negs = np.searchsorted(noise_cdf, rng.random((b, neg))).clip(0, vocab_size - 1)
        vc = w_in[c]                              # [b, d]
        targets = np.concatenate([o[:, None], negs], axis=1)   # [b, 1+neg]
        vt = w_out[targets]                       # [b, 1+neg, d]
        logits = np.clip(np.einsum("bd,bkd->bk", vc, vt), -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-logits))
        lab = np.zeros_like(p)
        lab[:, 0] = 1.0
        dlogit = (p - lab) * alpha                # [b, 1+neg]
        grad_c = _clip_rows(np.einsum("bk,bkd->bd", dlogit, vt))
        grad_t = _clip_rows(dlogit[:, :, None] * vc[:, None, :])
        np.add.at(w_in, c, -grad_c)
        np.add.at(w_out, targets.ravel(), -grad_t.reshape(-1, dim))


def _clip_rows(g: np.ndarray, cap: float = 25.0) -> np.ndarray:
    """Runaway-update backstop: rescale any gradient row whose norm exceeds
    ``cap`` (healthy SGNS steps are ~1e-2; 25.0 is only reachable mid
    blow-up).  Returns ``g`` UNTOUCHED when no row exceeds — the stable
    path stays bit-identical to the historical kernel."""
    n2 = (g * g).sum(axis=-1, keepdims=True)
    over = n2 > cap * cap
    if not over.any():
        return g
    f = np.where(over, cap / np.sqrt(np.maximum(n2, 1e-300)), 1.0)
    return g * f


def _extract_sgns_shard(shard: int, n_shards: int, *blocks: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """One shard's (centers, contexts), key-sorted — shard membership is
    ``key % n_shards`` so content is deterministic under any block layout.
    Blocks arrive as varargs so Ray dereferences the object-store refs
    zero-copy (a list of refs would NOT be dereferenced)."""
    tbl = pa.concat_tables([b for b in blocks if b.num_rows])
    keys = tbl.column("key").to_numpy(zero_copy_only=False)
    mask = (keys % n_shards) == shard
    order = np.argsort(keys[mask], kind="stable")
    centers = tbl.column("center").to_numpy(zero_copy_only=False)[mask][order]
    contexts = tbl.column("context").to_numpy(zero_copy_only=False)[mask][order]
    return centers.astype(np.int64), contexts.astype(np.int64)


def _sgns_shard_epoch(
    arrays: tuple[np.ndarray, np.ndarray],
    w_in: np.ndarray,
    w_out: np.ndarray,
    noise_cdf: np.ndarray,
    alpha: float,
    entropy: list[int],
    neg: int,
    batch_size: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    centers, contexts = arrays
    w_in = w_in.copy()
    w_out = w_out.copy()
    rng = np.random.default_rng(np.random.SeedSequence(entropy))
    _sgns_epoch(w_in, w_out, centers, contexts, noise_cdf, alpha, rng, neg, batch_size)
    return w_in, w_out, len(centers)


def train_skipgram_sharded(
    pairs: ray.data.Dataset,
    vocab_size: int,
    dim: int = 32,
    epochs: int = 3,
    neg: int = 5,
    lr: float = 0.05,
    seed: int = 7,
    n_shards: int = 8,
    batch_size: int = 1024,
    return_context: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Distributed SGNS by per-epoch parameter averaging (the classic
    data-parallel word2vec recipe: each worker runs one local epoch from
    the broadcast weights over its fixed pair shard, the driver averages
    shard weights by pair count).  The corpus-sized pair set NEVER touches
    the driver — shards are extracted into the object store once (one
    filtered pass per shard over the materialized pair blocks) and epochs
    ship only O(V×dim) weights.  Deterministic: shard membership is
    ``key % n_shards``, each shard's rng seeds on (seed, shard, epoch).
    Scale bound is the MODEL, not the corpus: a reference-scale 3M×300
    table (7 GB of f64 weights) would need a parameter-server sharding of
    the vocab axis — documented, not implemented.  ``n_shards=1``
    degenerates to a single worker training on all pairs."""
    pairs = pairs.materialize()
    blocks = pairs.to_arrow_refs()

    # global noise distribution: per-batch context value_counts partials →
    # one vocab-bounded driver fold (bit-identical to the driver-side
    # bincount in train_skipgram)
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(batch.column("context"))
        return pa.Table.from_pydict(
            {"id": vc.field("values").cast(pa.int64()), "n": vc.field("counts").cast(pa.int64())}
        )

    counts = np.zeros(vocab_size, dtype=np.float64)
    for row in pairs.map_batches(partial, batch_format="pyarrow").groupby("id").sum("n").take_all():
        counts[int(row["id"])] = float(row["sum(n)"])
    noise = distribution_to_power(np.maximum(counts, 1e-9) / max(1.0, counts.sum()), 0.75)
    noise_cdf = np.cumsum(noise)

    extract = ray.remote(_extract_sgns_shard)
    shard_refs = [extract.remote(s, n_shards, *blocks) for s in range(n_shards)]
    size_of = ray.remote(lambda arrays: int(arrays[0].shape[0]))
    sizes = np.array(ray.get([size_of.remote(r) for r in shard_refs]), dtype=np.float64)

    rng = np.random.default_rng(np.random.SeedSequence([seed, vocab_size, dim, 15485863]))
    w_in = ((rng.random((vocab_size, dim)) - 0.5) / dim).astype(np.float64)
    w_out = np.zeros((vocab_size, dim), dtype=np.float64)
    step = ray.remote(_sgns_shard_epoch)
    cdf_ref = ray.put(noise_cdf)
    bs = _stable_batch_size(batch_size, vocab_size)
    for epoch in range(epochs):
        alpha = lr * (1.0 - epoch / max(1, epochs))
        in_ref, out_ref = ray.put(w_in), ray.put(w_out)
        results = ray.get(
            [
                step.remote(
                    shard_refs[s], in_ref, out_ref, cdf_ref, alpha,
                    [seed, vocab_size, dim, 15485863, s, epoch], neg, bs,
                )
                for s in range(n_shards)
            ]
        )
        weights = sizes / max(1.0, sizes.sum())
        w_in = sum(w * r[0] for w, r in zip(weights, results))
        w_out = sum(w * r[1] for w, r in zip(weights, results))
    if return_context:
        return w_in.astype(np.float32), w_out.astype(np.float32)
    return w_in.astype(np.float32)


def pretrain_word_vectors(
    parsed: ray.data.Dataset,
    w2i: dict[str, int],
    dim: int = 32,
    window: int = 4,
    epochs: int = 3,
    neg: int = 5,
    lr: float = 0.05,
    seed: int = 7,
    n_shards: int | None = None,
) -> np.ndarray:
    """End-to-end self-trained word vectors for :func:`embedding_init` /
    the fit ``init_word_emb`` hooks: distributed pair generation over the
    corpus sentences, then either the driver-side SGNS fit (default —
    pairs collected key-sorted) or, with ``n_shards``, the
    parameter-averaged :func:`train_skipgram_sharded` scale path where the
    pair set stays in the object store.  The [V, dim] result rows are
    already in vocab-id order."""
    pairs = skipgram_pairs(parsed, w2i, window=window)
    if n_shards is not None:
        return train_skipgram_sharded(
            pairs, len(w2i), dim=dim, epochs=epochs, neg=neg, lr=lr, seed=seed,
            n_shards=n_shards,
        )
    rows = pairs.sort("key").take_all()
    centers = np.array([r["center"] for r in rows], dtype=np.int64)
    contexts = np.array([r["context"] for r in rows], dtype=np.int64)
    return train_skipgram(
        centers, contexts, len(w2i), dim=dim, epochs=epochs, neg=neg, lr=lr, seed=seed
    )


def cluster_pair_labels(
    encoded: ray.data.Dataset, clusters: dict[int, int], num_clusters: int, oov_cluster: int | None = None
) -> ray.data.Dataset:
    """M18 (clustered distant labels): target id pair → ``cx*K + cy``
    with OOV-cluster fallback; cluster map broadcast once."""
    oov = num_clusters - 1 if oov_cluster is None else oov_cluster
    ref = ray.put(dict(clusters))

    class Label:
        def __init__(self) -> None:
            self.c = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            labels = []
            for x, y in batch.column("target_ids").to_pylist():
                labels.append(self.c.get(x, oov) * num_clusters + self.c.get(y, oov))
            return pa.Table.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "sent_id": batch.column("sent_id"),
                    "pair_id": batch.column("pair_id"),
                    "cluster_label": pa.array(labels, pa.int32()),
                }
            )

    return encoded.map_batches(Label, batch_format="pyarrow", concurrency=(1, 4))
