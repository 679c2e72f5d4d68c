"""Text-analysis operators over a (doc_id, text, ...) documents table.

These generalize the reference's corpus statistics (vocab build
``wiki2sdp.py:186-233``, normalization ``wiki2sdp.py:46-53``) to the
operations a large-scale training-data pipeline needs: vocabulary/top-k,
per-doc quality features, token counting, fingerprinting, language ID.
All stages are vectorized ``map_batches`` over Arrow; every groupby is fed
by per-batch partial combiners so shuffled volume is bounded by distinct
keys per batch, not row count.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _split_lower(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """lower + split on single space — deliberately the exact semantics of
    SQL ``string_split(lower(text), ' ')`` so oracle comparisons are exact
    (empty tokens included)."""
    return pc.split_pattern(pc.utf8_lower(col), " ")


def vocab_top_k(docs: ray.data.Dataset, k: int = 100, text_col: str = "text") -> ray.data.Dataset:
    """Corpus vocabulary, top-k by (count desc, token asc) — the A1/O4
    pattern: partial counts per batch → small groupby → sort+limit."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(_split_lower(batch.column(text_col)))
        vc = toks.value_counts()
        tokens = vc.field("values")
        counts = vc.field("counts")
        mask = pc.not_equal(tokens, "")
        return pa.Table.from_pydict(
            {"token": tokens.filter(mask), "cnt": counts.filter(mask).cast(pa.int64())},
        )

    counted = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
    )
    return (
        counted.map_batches(
            lambda t: t.rename_columns(["token", "cnt"]), batch_format="pyarrow"
        )
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


def doc_stats_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source corpus stats: docs, chars, whitespace tokens.
    Partial sums per batch → tiny groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        # one Arrow hash-aggregate per batch — no per-row Python
        pre = pa.table(
            {
                "source": batch.column("source"),
                "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
                "total_chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
                "total_tokens": pc.list_value_length(
                    pc.split_pattern(batch.column("text"), " ")
                ).cast(pa.int64()),
            }
        )
        out = pre.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("total_chars", "sum"), ("total_tokens", "sum")]
        )
        return out.rename_columns(["source", "n_docs", "total_chars", "total_tokens"])

    g = docs.map_batches(partial, batch_format="pyarrow").groupby("source")
    out = g.aggregate(
        ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
        ray.data.aggregate.Sum("total_chars", alias_name="total_chars"),
        ray.data.aggregate.Sum("total_tokens", alias_name="total_tokens"),
    )
    return out.sort("source")


def fingerprints(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Per-doc content fingerprint: md5 hex of lowercased text (matches SQL
    ``md5(lower(text))`` for exact oracle equality)."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch.column(text_col)).to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "fp": [hashlib.md5(t.encode()).hexdigest() for t in texts],
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def quality_features(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc quality features: token count, distinct-token count,
    max token length — the length/uniqueness screens of a training-data
    quality filter, one vectorized pass, no shuffle."""

    def feats(batch: pa.Table) -> pa.Table:
        # fully vectorized (round 4): per-row distinct via one Arrow
        # hash-aggregate on (row, token) pairs, per-row max via a uint
        # scatter-max — no Python loop over rows or tokens
        split = _split_lower(batch.column("text"))
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(lens)
        flat = pc.list_flatten(split)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        max_len = np.zeros(n, np.int64)
        np.maximum.at(max_len, row, tok_len)
        pairs = (
            pa.table({"r": pa.array(row), "t": flat})
            .group_by(["r", "t"])
            .aggregate([])
        )
        n_uniq = np.zeros(n, np.int64)
        r = pairs.column("r").to_numpy(zero_copy_only=False)
        np.add.at(n_uniq, r, 1)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(lens),
                "n_uniq": pa.array(n_uniq),
                "max_token_len": pa.array(max_len),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow")


# --- language ID: n-gram heuristic (no SQL equivalent; rows-only check) ----

_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is was for with that".split()),
    "de": frozenset("der die das und ist nicht mit ein von zu".split()),
    "fr": frozenset("le la les et de un une est pour dans".split()),
    "es": frozenset("el la los y de un una es por con".split()),
}


class LangIdStage:
    """Stopword-overlap language scorer (actor-pool stage; marker sets are
    compiled once per actor). Deterministic: ties broken by language code
    (``argmax`` over the code-sorted count vector returns the FIRST max —
    the same winner as ``max(sorted(langs), key=overlap)``)."""

    def __init__(self) -> None:
        self.langs = sorted(_LANG_MARKERS)
        # marker vocabulary + (n_marker_tokens × n_langs) 0/1 membership
        # matrix, built once per actor; __call__ is then one index_in over
        # the batch's flat token array + numpy scatter-adds — no per-row loop
        vocab = sorted({t for s in _LANG_MARKERS.values() for t in s})
        self.marker_vocab = pa.array(vocab, pa.string())
        self.membership = np.zeros((len(vocab), len(self.langs)), dtype=np.int64)
        pos = {t: i for i, t in enumerate(vocab)}
        for j, lang in enumerate(self.langs):
            for tok in _LANG_MARKERS[lang]:
                self.membership[pos[tok], j] = 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _split_lower(batch.column("text")).combine_chunks()
        n_docs = batch.num_rows
        offs = toks.offsets.to_numpy().astype(np.int64)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        hit = pc.index_in(toks.values, value_set=self.marker_vocab)
        hit_np = hit.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        valid = hit_np >= 0
        counts = np.zeros((n_docs, len(self.langs)), dtype=np.int64)
        if valid.any():
            # distinct (doc, marker-token) pairs — overlap counts DISTINCT
            # marker tokens per doc, so dedupe before the scatter-add
            tok_ids = hit_np[valid]
            keys = doc_idx[valid] * len(self.marker_vocab) + tok_ids
            uniq = np.unique(keys)
            u_doc = uniq // len(self.marker_vocab)
            u_tok = uniq % len(self.marker_vocab)
            np.add.at(counts, u_doc, self.membership[u_tok])
        best = counts.argmax(axis=1)
        lang_arr = np.array(self.langs, dtype=object)[best]
        lang_arr[counts.max(axis=1) == 0] = "und"
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(lang_arr, pa.string())}
        )


def lang_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    # task map with a per-worker-process stage cache — the marker sets are
    # microseconds to build, and the actor pool's spin-up was ~3 s of a
    # 4 s query (same finding as the KG task-mode stages)
    from ..taskexec import cached_stage_fn

    return docs.map_batches(cached_stage_fn(LangIdStage, (), {}), batch_format="pyarrow")


# --- token counting: whitespace + subword-style regex runs -----------------

#: Subword-ish pre-tokenizer pattern (letter runs | digit runs | single
#: other non-space char) — the class-disjoint shape makes greedy matching
#: identical between Python ``re`` and DuckDB's RE2, so the count is
#: exactly SQL-checkable.  A production BPE would split the letter runs
#: further against a merges table; the RUN count is the schedulable unit
#: (batch sizing, cost estimates) a pipeline needs.
#: Whitespace is an EXPLICIT ASCII class, not ``\s`` — Python's \s is
#: Unicode-aware (\x0b, \xa0, ...) while DuckDB RE2's is ASCII-only,
#: and the two diverge on e.g. vertical tab; the literal class keeps the
#: engines byte-identical.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]"
WS_REGEX = r"[ \t\n\f\r]+"

_TOKEN_RE = None
_WS_RE = None


def token_counts(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Per-doc token counts: whitespace tokens, regex subword-style tokens
    (:data:`TOKEN_REGEX` runs) and characters — one vectorized scan, no
    shuffle.  The regex is compiled once per worker process."""

    def counts(batch: pa.Table) -> pa.Table:
        global _TOKEN_RE, _WS_RE
        if _TOKEN_RE is None:
            import re

            _TOKEN_RE = re.compile(TOKEN_REGEX)
            _WS_RE = re.compile(WS_REGEX)
        col = batch.column(text_col)
        ws_counts = []
        bpe_counts = []
        for t in col.to_pylist():
            ws_counts.append(sum(1 for x in _WS_RE.split(t) if x))
            bpe_counts.append(len(_TOKEN_RE.findall(t)))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "ws_tokens": pa.array(ws_counts, pa.int64()),
                "regex_tokens": pa.array(bpe_counts, pa.int64()),
                "n_chars": pc.utf8_length(col).cast(pa.int64()),
            }
        )

    return docs.map_batches(counts, batch_format="pyarrow")


# --- rolling-hash document fingerprints (winnowing) ------------------------

#: Rabin-Karp parameters: base, Mersenne modulus 2^31-1 (products stay
#: < 2^52, so the whole pipeline is pure vectorized uint64 — no bigint),
#: k-gram length, winnowing window.
_RK_B, _RK_M = 257, 2147483647
_RK_K, _RK_W = 5, 4


def _rk_hashes(text: str) -> np.ndarray:
    """All k-gram Rabin-Karp hashes of ``text`` (vectorized Horner over
    character codes; rolling-equivalent values)."""
    n = len(text)
    if n < _RK_K:
        return np.empty(0, dtype=np.uint64)
    o = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    h = np.zeros(n - _RK_K + 1, dtype=np.uint64)
    for j in range(_RK_K):
        pw = np.uint64(pow(_RK_B, _RK_K - 1 - j, _RK_M))
        h = (h + o[j : j + n - _RK_K + 1] * pw) % np.uint64(_RK_M)
    return h


def rolling_fingerprints(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    MOSS scheme): Rabin-Karp k-gram rolling hashes, then the minimum of
    every w-window, distinct + sorted.  Any shared substring of length
    ≥ k + w - 1 between two docs guarantees a shared fingerprint, so the
    sorted fps lists support containment/overlap near-dup detection at a
    fraction of full-shingle cost.  One scan, no shuffle; value-exact SQL
    oracle (HUGEINT polynomial replay in DuckDB)."""

    def fp(batch: pa.Table) -> pa.Table:
        out: list[list[int]] = []
        for t in batch.column(text_col).to_pylist():
            h = _rk_hashes(t)
            if len(h) == 0:
                out.append([])
            elif len(h) <= _RK_W:
                out.append([int(h.min())])
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, _RK_W)
                out.append(sorted({int(x) for x in sw.min(axis=1)}))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "fps": pa.array(out, pa.list_(pa.uint64())),
                "n_fps": pa.array([len(x) for x in out], pa.int64()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


# --- legacy multi-delimiter tokenizer + OOV sentence filter (M19/M20) -------

#: The reference's legacy delimiter set (``data_helper.py:11``): its
#: ``split()`` (``data_helper.py:22-24``) regex-splits on any one of these
#: single characters and callers drop the empty strings that consecutive
#: delimiters produce (``data_helper.py:37`` — ``w for w in split(s) if w
#: is not ''``).
LEGACY_DELIMS = " .;:%\"$^,"
_LEGACY_CLASS = '[ .;:%"$^,]'


def legacy_tokens(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """M19 — the reference's legacy multi-delimiter tokenizer
    (``data_helper.py:22-24``), fully vectorized.

    Because ``' '`` is itself one of the delimiters, "split on the class,
    drop empties, re-join with a single space" is EXACTLY "collapse every
    delimiter run to one space, then trim" — one Arrow regex-replace per
    batch, no per-row Python.  Emits the space-joined token stream plus the
    non-empty token count; one scan, no shuffle."""

    def tok(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        joined = pc.utf8_trim(
            pc.replace_substring_regex(col, _LEGACY_CLASS + "+", " "), " "
        )
        n = pc.if_else(
            pc.equal(joined, ""),
            pa.scalar(0, pa.int64()),
            pc.add(pc.count_substring(joined, " "), 1).cast(pa.int64()),
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n,
                "tokens_joined": joined,
            }
        )

    return docs.map_batches(tok, batch_format="pyarrow")


def oov_filter(
    docs: ray.data.Dataset, min_count: int = 10, text_col: str = "text"
) -> ray.data.Dataset:
    """M20 — the reference's ``is_oov`` sentence filter
    (``data_helper.py:16-20``): drop any document containing a token
    outside the vocabulary.

    The reference takes an in-memory ``vocab_set``; here the vocabulary is
    built FROM the corpus (legacy tokens with corpus frequency
    ``>= min_count`` — the wiki2sdp-style truncation) in a first streaming
    pass (per-batch ``value_counts`` partials → one small groupby over
    distinct tokens), shipped once via ``ray.put``, and the filter pass is
    vectorized: flatten the per-doc token lists, ONE ``is_in`` against the
    vocab array, and per-row OOV counts by cumulative-sum differencing on
    the list offsets.  Shuffled volume is bounded by distinct tokens per
    batch; the broadcast is O(vocab) — the same bound the reference's
    in-memory ``vocab_set`` already imposes."""

    def partial(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(batch.column(text_col), _LEGACY_CLASS)
        vc = pc.list_flatten(lists).value_counts()
        tokens = vc.field("values")
        counts = vc.field("counts")
        mask = pc.not_equal(tokens, "")
        return pa.Table.from_pydict(
            {"token": tokens.filter(mask), "cnt": counts.filter(mask).cast(pa.int64())}
        )

    def above_min(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("sum(cnt)"), min_count)).select(
            ["token"]
        )

    counted = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .map_batches(above_min, batch_format="pyarrow")
    )
    vocab_tbl = pa.concat_tables(list(counted.iter_batches(batch_format="pyarrow")))
    vocab_ref = ray.put(vocab_tbl.column("token").combine_chunks())

    def keep(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        lists = pc.split_pattern_regex(batch.column(text_col), _LEGACY_CLASS)
        la = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        values = la.values
        offsets = np.asarray(la.offsets)
        bad = pc.and_(
            pc.not_equal(values, ""),
            pc.invert(pc.is_in(values, value_set=vocab)),
        )
        badnp = bad.to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(badnp)])
        ok = (cum[offsets[1:]] - cum[offsets[:-1]]) == 0
        return batch.filter(pa.array(ok))

    return docs.map_batches(keep, batch_format="pyarrow")


# --- regex redaction / masking (PII-style scrubbing) ------------------------

#: Default masking rules, applied IN ORDER (earlier rules consume their
#: matches before later ones run — emails before numbers, so the digits
#: inside an address are never double-masked).  Patterns are RE2-safe
#: (no backreferences/lookarounds, non-capturing groups only) so DuckDB
#: `regexp_replace/extract_all` replays them byte-identically.
REDACT_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("number", r"[0-9]+(?:\.[0-9]+)?", "<NUM>"),
]


def redact(
    docs: ray.data.Dataset,
    column: str = "text",
    rules: list[tuple[str, str, str]] | None = None,
) -> ray.data.Dataset:
    """Sequential regex masking of a string column — the scrubbing pass a
    training-data pipeline runs before publishing a corpus (PII, secrets,
    numeric noise).  For each ``(name, pattern, token)`` rule in order:
    count the matches remaining in the CURRENT text (so overlapping rules
    never double-count), then replace them with ``token``.  Fully
    vectorized (`count_substring_regex` + `replace_substring_regex` per
    batch, both RE2); one scan, no shuffle; output adds one ``n_<name>``
    count column per rule plus the redacted column."""
    rules = REDACT_RULES if rules is None else rules

    def scrub(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        out: dict = {
            name: batch.column(name) for name in batch.column_names if name != column
        }
        for name, pattern, token in rules:
            out[f"n_{name}"] = pc.count_substring_regex(col, pattern).cast(pa.int64())
            col = pc.replace_substring_regex(col, pattern, token)
        out[column] = col
        return pa.Table.from_pydict(out)

    return docs.map_batches(scrub, batch_format="pyarrow")


# --- within-doc repetition stats (Gopher/MassiveText quality filters) -------


def repetition_stats(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Per-document n-gram repetition signals — the Gopher/MassiveText
    repetition filters (Rae et al. 2021, table A1): for n in {2, 3}, the
    fraction of n-gram occurrences that repeat an already-seen n-gram
    (``dup{n}_milli``) and the share of the single most frequent n-gram
    (``top{n}_milli``), both as drift-free milli-integers.

    Purely per-row: one streaming scan, no shuffle.  Gram generation is
    the shared vectorized :func:`..decontam.ngram_strings`; per-doc
    distinct/top counts come from ONE Arrow ``group_by`` over the batch's
    flat (doc, gram) pairs + numpy ``bincount``/``maximum.at`` — no
    Python loop over rows.  Docs with fewer than ``n`` tokens report
    zeros.  No reference counterpart (engine addition per the
    LLM-data-pipeline mandate)."""
    from .decontam import ngram_strings

    def rep(batch: pa.Table) -> pa.Table:
        nr = batch.num_rows
        cols: dict = {"doc_id": batch.column("doc_id")}
        for n in (2, 3):
            di, grams = ngram_strings(batch.column(text_col), n)
            total = np.bincount(di, minlength=nr).astype(np.int64)
            distinct = np.zeros(nr, dtype=np.int64)
            top = np.zeros(nr, dtype=np.int64)
            if len(di):
                agg = (
                    pa.table({"di": pa.array(di), "g": pa.array(grams, pa.string())})
                    .group_by(["di", "g"])
                    .aggregate([("g", "count")])
                )
                adx = agg.column("di").to_numpy()
                cnt = agg.column("g_count").to_numpy().astype(np.int64)
                distinct = np.bincount(adx, minlength=nr).astype(np.int64)
                np.maximum.at(top, adx, cnt)
            safe = np.maximum(total, 1)
            cols[f"n_{n}grams"] = pa.array(total)
            cols[f"dup{n}_milli"] = pa.array(
                np.floor(1000.0 * (total - distinct) / safe + 0.5).astype(np.int64)
            )
            cols[f"top{n}_milli"] = pa.array(
                np.floor(1000.0 * top / safe + 0.5).astype(np.int64)
            )
        return pa.Table.from_pydict(cols)

    return docs.map_batches(rep, batch_format="pyarrow")


# --- cross-corpus boilerplate score (CCNet-adjacent common-shingle ratio) ---


def boilerplate_score(
    docs: ray.data.Dataset,
    n: int = 3,
    min_df: int = 3,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-document boilerplate ratio: the fraction of a doc's DISTINCT
    token ``n``-shingles that occur in ≥ ``min_df`` documents corpus-wide
    (the CCNet/paragraph-dedup idea recast for flat text: common shingles
    are boilerplate; a doc made of them is template noise).

    Scale shape (100 TB): never broadcasts the common-shingle set (which
    grows with the corpus).  Two keyed exchanges: (1) distinct
    (doc, shingle) pairs hash-partition by SHINGLE, so each partition
    holds every occurrence of its shingles and computes exact
    document frequency locally, emitting per-doc partials
    (n_shingles, n_common); (2) a ``groupby(doc_id).sum`` over those
    partials — one row per (doc × partition), ≪ the pair volume.  A
    zero-partial per doc (unioned straight into the final aggregate, one
    cheap scan, never through the shingle exchange) guarantees every
    document appears in the output.  Output: ``doc_id, n_shingles,
    n_common, common_milli`` (milli-integer ratio, 0 when the doc has no
    shingles)."""
    from .decontam import ngram_strings
    from .joins import derive_n_parts, hash_partitioned_groups

    def pairs(batch: pa.Table) -> pa.Table:
        di, grams = ngram_strings(batch.column(text_col), n)
        ids = batch.column("doc_id")
        if len(di) == 0:
            return pa.table(
                {"doc_id": pa.array([], ids.type), "g": pa.array([], pa.string())}
            )
        dedup = (
            pa.table({"di": pa.array(di), "g": pa.array(grams, pa.string())})
            .group_by(["di", "g"])
            .aggregate([])
        )
        return pa.table(
            {"doc_id": ids.take(dedup.column("di")), "g": dedup.column("g")}
        )

    def per_part(part: pa.Table) -> pa.Table:
        df = part.group_by("g").aggregate([("g", "count")])
        common = df.filter(pc.greater_equal(df.column("g_count"), min_df)).column("g")
        is_common = pc.is_in(part.column("g"), value_set=common.combine_chunks())
        partial = pa.table(
            {
                "doc_id": part.column("doc_id"),
                "n_sh": pa.array(np.ones(part.num_rows, dtype=np.int64)),
                "n_common": is_common.cast(pa.int64()),
            }
        )
        return partial.group_by("doc_id").aggregate([("n_sh", "sum"), ("n_common", "sum")])

    def zeros(batch: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(batch.num_rows, dtype=np.int64))
        return pa.table({"doc_id": batch.column("doc_id"), "n_sh_sum": z, "n_common_sum": z})

    pair_ds = docs.map_batches(pairs, batch_format="pyarrow")
    n_parts = derive_n_parts(docs.count() * 64, rows_per_part=65536)
    partials = hash_partitioned_groups(pair_ds, ["g"], per_part, n_parts).union(
        docs.map_batches(zeros, batch_format="pyarrow")
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_sh = batch.column("sum(n_sh_sum)").to_numpy().astype(np.int64)
        n_common = batch.column("sum(n_common_sum)").to_numpy().astype(np.int64)
        safe = np.maximum(n_sh, 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_shingles": pa.array(n_sh),
                "n_common": pa.array(n_common),
                "common_milli": pa.array(
                    np.floor(1000.0 * n_common / safe + 0.5).astype(np.int64)
                ),
            }
        )

    return (
        partials.groupby("doc_id")
        .sum(["n_sh_sum", "n_common_sum"])
        .map_batches(finish, batch_format="pyarrow")
    )


def _doc_term_freqs(batch: pa.Table, text_col: str) -> pa.Table:
    """Within-batch (doc_id, token, tf) table — exact because a document
    never spans batches.  Fully vectorized: list-flatten with parent
    indices, then one Arrow hash aggregation over (row, token)."""
    lists = _split_lower(batch.column(text_col))
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    grouped = (
        pa.table({"row": parent.filter(mask), "token": flat.filter(mask)})
        .group_by(["row", "token"])
        .aggregate([("token", "count")])
    )
    doc_ids = batch.column("doc_id").take(grouped.column("row"))
    return pa.table(
        {
            "doc_id": doc_ids,
            "token": grouped.column("token"),
            "tf": grouped.column("token_count").cast(pa.int64()),
        }
    )


def tfidf_top_terms(
    docs: ray.data.Dataset, k: int = 5, text_col: str = "text"
) -> ray.data.Dataset:
    """Per-document top-``k`` terms by tf-idf (raw-ratio idf variant:
    ``score = tf * N / df``, reported as a drift-free milli-integer
    ``floor(1000 * tf * N / df + 0.5)`` so engine and SQL replay agree
    bit for bit), rank ties broken by token asc.

    Scale shape: the document-frequency table is built with ONE
    vocab-bounded shuffle (per-batch distinct (doc, token) partials →
    ``groupby(token).sum``), then broadcast once via ``ray.put`` —
    O(vocab) per node, the T5/T6 broadcast pattern (a corpus whose vocab
    exceeds worker heap would join the df table reduce-side instead, the
    same planner split :func:`~relation_extraction_ray.state.linker`
    uses).  Scoring + per-doc top-k is a single streaming pass: a
    document's term rows never leave the batch they were tokenized in,
    so the select is a local Arrow sort + segmented rank — no per-doc
    shuffle at any point."""

    def df_partial(batch: pa.Table) -> pa.Table:
        tf = _doc_term_freqs(batch, text_col)
        vc = tf.column("token").combine_chunks().value_counts()
        return pa.table(
            {"token": vc.field("values"), "df": vc.field("counts").cast(pa.int64())}
        )

    df_tbl = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .sum("df")
        .to_pandas()
    )
    tokens = pa.array(df_tbl["token"].to_numpy(), pa.string())
    dfs = df_tbl["sum(df)"].to_numpy().astype(np.float64)
    n_docs = float(docs.count())
    df_ref = ray.put((tokens, dfs))

    def score(batch: pa.Table) -> pa.Table:
        tok_arr, df_arr = ray.get(df_ref)
        tf = _doc_term_freqs(batch, text_col)
        if tf.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "score_milli": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        idx = pc.index_in(tf.column("token"), tok_arr).to_numpy(zero_copy_only=False)
        tf_np = tf.column("tf").to_numpy().astype(np.float64)
        # identical double-precision expression to the SQL oracle:
        # floor(((1000.0 * tf) * N) / df + 0.5)
        milli = np.floor((1000.0 * tf_np) * n_docs / df_arr[idx] + 0.5).astype(np.int64)
        scored = tf.append_column("score_milli", pa.array(milli))
        order = pc.sort_indices(
            scored,
            sort_keys=[
                ("doc_id", "ascending"),
                ("score_milli", "descending"),
                ("token", "ascending"),
            ],
        )
        s = scored.take(order)
        d = s.column("doc_id").to_numpy()
        new_doc = np.concatenate([[True], d[1:] != d[:-1]])
        starts = np.flatnonzero(new_doc)
        rank = np.arange(len(d), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(d)]]))
        ) + 1
        s = s.append_column("rank", pa.array(rank))
        return s.filter(pa.array(rank <= k))

    return docs.map_batches(score, batch_format="pyarrow")


def heavy_hitters(
    docs: ray.data.Dataset, denom: int = 2000, text_col: str = "text"
) -> ray.data.Dataset:
    """EXACT frequent terms: every token whose corpus count exceeds
    ``n_tokens / denom`` (the phi = 1/denom heavy hitters), with its exact
    count.  Generalizes the reference's vocab-from-data scan
    (``wiki2sdp.py:186-233``) to the bounded-exchange shape exact heavy
    hitters need at 100 TB — the classic two-scan sketch-then-verify:

    1. **Candidate scan** (per-batch frequent filter, the vectorized
       Misra-Gries / lossy-counting bound): each batch emits only tokens
       with local count > eps * batch_tokens where eps = phi/2, plus one
       sentinel row carrying the batch token total.  At most ``1/eps =
       2*denom`` rows leave any batch, so the groupby exchange is bounded
       by sketch size x batches, never by distinct-token count.  For any
       token, the filtered-away mass is <= eps * n per batch-sum, so every
       true heavy hitter (count > phi*n) retains partial sum > eps*n —
       keeping candidates with partial sum > eps*n is a strict superset of
       the answer, and total emitted mass <= n caps the candidate set at
       ``2*denom`` tokens (driver-safe broadcast at any corpus size).
    2. **Exact recount scan**: candidates broadcast once via ``ray.put``;
       each batch counts only candidate tokens (``index_in`` + bincount),
       tiny groupby, exact integer threshold ``count * denom > n``.

    All thresholds are exact integer comparisons (no float drift vs the
    SQL oracle): ``c > eps*n_b`` with eps = 1/(2*denom) is
    ``c * 2 * denom > n_b``.
    """
    sentinel = "\x00total\x00"

    def candidate_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(_split_lower(batch.column(text_col)))
        vc = toks.value_counts()
        tokens = vc.field("values")
        counts = vc.field("counts").cast(pa.int64())
        keep = pc.not_equal(tokens, "")
        tokens, counts = tokens.filter(keep), counts.filter(keep)
        n_b = int(pc.sum(counts).as_py() or 0)
        # local frequent filter: c * 2 * denom > n_b
        hot = pc.greater(pc.multiply(counts, pa.scalar(2 * denom, pa.int64())), n_b)

        def plain(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        return pa.table(
            {
                "token": pa.concat_arrays(
                    [plain(tokens.filter(hot)).cast(pa.string()), pa.array([sentinel], pa.string())]
                ),
                "cnt": pa.concat_arrays(
                    [plain(counts.filter(hot)), pa.array([n_b], pa.int64())]
                ),
            }
        )

    sketch = (
        docs.map_batches(candidate_partial, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .map_batches(lambda t: t.rename_columns(["token", "cnt"]), batch_format="pyarrow")
    )
    # sketch is <= 2*denom candidate rows + 1 sentinel: driver-safe take_all
    rows = sketch.take_all()
    n_total = 0
    cand: list[str] = []
    for r in rows:
        if r["token"] == sentinel:
            n_total = int(r["cnt"])
    for r in rows:
        # superset filter: partial sum > eps*n  <=>  cnt * 2 * denom > n
        if r["token"] != sentinel and int(r["cnt"]) * 2 * denom > n_total:
            cand.append(r["token"])
    cand_arr = pa.array(sorted(cand), pa.string())
    ref = ray.put((cand_arr, n_total))

    def recount(batch: pa.Table) -> pa.Table:
        cands, _ = ray.get(ref)
        toks = pc.list_flatten(_split_lower(batch.column(text_col)))
        idx = pc.index_in(toks, cands)
        hits = idx.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.bincount(hits, minlength=len(cands)).astype(np.int64)
        nz = np.flatnonzero(c)
        return pa.table(
            {
                "token": cands.take(pa.array(nz)),
                "cnt": pa.array(c[nz], pa.int64()),
            }
        )

    exact = (
        docs.map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .map_batches(lambda t: t.rename_columns(["token", "cnt"]), batch_format="pyarrow")
    )

    def threshold(batch: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(batch.column("cnt"), pa.scalar(denom, pa.int64())),
            pa.scalar(n_total, pa.int64()),
        )
        return batch.filter(keep)

    return exact.map_batches(threshold, batch_format="pyarrow").sort(
        ["cnt", "token"], descending=[True, False]
    )


# --- cross-doc duplicated passages (exact substring-dup detection) ----------

def _ngram_windows(
    text_col: "pa.ChunkedArray", n: int
) -> tuple["np.ndarray | None", "np.ndarray | None", "pa.Array | None"]:
    """Vectorized token n-gram windows over a batch of texts: returns
    (doc row index, 0-based token start position within the doc, joined
    n-gram string) for every window that stays inside one document —
    list-flatten + window-sliced ``binary_join_element_wise``, no per-row
    Python.  ``(None, None, None)`` when the batch has no window."""
    lists = _split_lower(text_col)
    la = lists.combine_chunks()
    flat = la.flatten()
    parent = pc.list_parent_indices(lists).combine_chunks()
    L = len(flat)
    if L < n:
        return None, None, None
    windows = [flat.slice(j, L - n + 1) for j in range(n)]
    joined = pc.binary_join_element_wise(*windows, " ")
    p = parent.to_numpy(zero_copy_only=False)
    valid = p[: L - n + 1] == p[n - 1 :]
    if not valid.any():
        return None, None, None
    row = p[: L - n + 1][valid]
    lengths = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_off = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    pos = np.flatnonzero(valid) - doc_off[row]
    return row, pos, joined.filter(pa.array(valid))


def dup_passages(
    docs: ray.data.Dataset, n: int = 5, text_col: str = "text"
) -> ray.data.Dataset:
    """Exact cross-document duplicated-passage detection: every token
    ``n``-gram that occurs in ≥ 2 distinct documents, with its document
    count, total occurrence count and the min/max doc ids carrying it —
    the signal behind substring-level training-data dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL'22:
    repeated ≥ 50-token spans; ``n`` is the configurable span length).

    Scale shape: ONE streaming scan builds the n-grams fully vectorized
    (list-flatten + window-sliced ``binary_join_element_wise`` — no
    per-row Python) and pre-aggregates per (ngram, doc) inside the batch,
    so the single keyed exchange ships one row per distinct (ngram, doc)
    pair per batch; the reduce is one hash aggregate.  Because a document
    never spans batches, summing per-batch distinct-doc partials is the
    EXACT distinct-document count.  At production scale the group key
    would be dictionary/hash-encoded before the exchange (the shuffled
    bytes are the n-gram strings themselves); semantics are identical, so
    the string key is kept here for the value-exact SQL replay.  Output
    is filtered to ``n_docs >= 2`` — the surviving set is bounded by true
    duplication, not corpus size."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        row, _pos, joined = _ngram_windows(batch.column(text_col), n)
        if row is None:
            return pa.schema(
                [("ngram", pa.string()), ("doc_id", pa.int64()), ("n_occ", pa.int64())]
            ).empty_table()
        grouped = (
            pa.table({"row": pa.array(row), "ngram": joined})
            .group_by(["row", "ngram"])
            .aggregate([("ngram", "count")])
        )
        return pa.table(
            {
                "ngram": grouped.column("ngram"),
                "doc_id": batch.column("doc_id").take(grouped.column("row")),
                "n_occ": grouped.column("ngram_count").cast(pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_occ", alias_name="n_occ"),
            Min("doc_id", alias_name="min_doc"),
            Max("doc_id", alias_name="max_doc"),
        )
    )

    def keep_dups(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.greater_equal(batch.column("n_docs"), 2))
        return out.select(["ngram", "n_docs", "n_occ", "min_doc", "max_doc"]).set_column(
            1, "n_docs", out.column("n_docs").cast(pa.int64())
        )

    return agg.map_batches(keep_dups, batch_format="pyarrow")


def dup_spans(
    docs: ray.data.Dataset, n: int = 5, text_col: str = "text"
) -> ray.data.Dataset:
    """Maximal duplicated-passage EXTENTS per document: merge every token
    window whose ``n``-gram occurs in ≥ 2 distinct documents into maximal
    covered-token intervals (gaps-and-islands: two windows merge when
    their [pos, pos+n-1] token spans overlap or touch, i.e.
    ``next_pos <= pos + n``), and report per doc the span count, total
    duplicated-token coverage and longest span — the actionable form of
    substring-level dedup (Lee et al., ACL'22: cut the repeated extent,
    not the whole document; ``dup_passages`` reports the shared n-grams,
    this reports WHERE they sit).

    Scale shape: two streaming scans.  Scan 1 is ``dup_passages``'s
    combine-fed (ngram, doc) exchange reduced to the cross-doc-duplicated
    n-gram SET — bounded by true duplication, not corpus size — which
    broadcasts once via ``ray.put`` (above worker heap the mark step
    re-keys windows by ngram instead, the adaptive planner split
    ``state/linker.py`` implements).  Scan 2 rebuilds windows per batch,
    marks members with one vectorized ``is_in``, and merges islands with
    numpy diff/cumsum — documents never span batches, so per-doc outputs
    finalize inside the batch and scan 2 needs NO exchange at all.
    Output: (doc_id, n_dup_spans, dup_tokens, max_span) for docs with ≥ 1
    span."""
    from ray.data.aggregate import Count

    def pair_partial(batch: pa.Table) -> pa.Table:
        row, _pos, joined = _ngram_windows(batch.column(text_col), n)
        if row is None:
            return pa.schema([("ngram", pa.string()), ("doc_id", pa.int64())]).empty_table()
        grouped = (
            pa.table({"row": pa.array(row), "ngram": joined})
            .group_by(["row", "ngram"])
            .aggregate([])
        )
        return pa.table(
            {
                "ngram": grouped.column("ngram"),
                "doc_id": batch.column("doc_id").take(grouped.column("row")),
            }
        )

    agg = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Count(alias_name="n_docs"))
    )

    def only_dup(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n_docs"), 2)).select(["ngram"])

    chunks = [
        b.column("ngram").combine_chunks()
        for b in agg.map_batches(only_dup, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    dup_set = pa.chunked_array(chunks or [pa.array([], pa.string())]).combine_chunks()
    ref = ray.put(dup_set)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_dup_spans", pa.int64()),
            ("dup_tokens", pa.int64()),
            ("max_span", pa.int64()),
        ]
    )

    def mark_and_merge(batch: pa.Table) -> pa.Table:
        row, pos, joined = _ngram_windows(batch.column(text_col), n)
        if row is None:
            return out_schema.empty_table()
        member = pc.is_in(joined, value_set=ray.get(ref)).to_numpy(zero_copy_only=False)
        row, pos = row[member], pos[member]
        if len(row) == 0:
            return out_schema.empty_table()
        # flattened window order is (doc, pos)-sorted already
        new_island = np.ones(len(row), bool)
        new_island[1:] = (row[1:] != row[:-1]) | (pos[1:] > pos[:-1] + n)
        starts = np.flatnonzero(new_island)
        ends = np.concatenate([starts[1:], [len(row)]]) - 1
        span_doc = row[starts]
        span_len = pos[ends] + n - pos[starts]
        doc_breaks = np.ones(len(span_doc), bool)
        doc_breaks[1:] = span_doc[1:] != span_doc[:-1]
        d0 = np.flatnonzero(doc_breaks)
        d1 = np.concatenate([d0[1:], [len(span_doc)]])
        csum = np.concatenate([[0], np.cumsum(span_len)])
        max_span = np.maximum.reduceat(span_len, d0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(span_doc[d0])),
                "n_dup_spans": pa.array((d1 - d0).astype(np.int64)),
                "dup_tokens": pa.array(csum[d1] - csum[d0], pa.int64()),
                "max_span": pa.array(max_span.astype(np.int64)),
            }
        )

    return docs.map_batches(mark_and_merge, batch_format="pyarrow")


# --- corpus drift: per-source chi-square divergence vs the corpus -----------

def corpus_drift(
    docs: ray.data.Dataset, group_col: str = "source", text_col: str = "text"
) -> ray.data.Dataset:
    """Domain-shift diagnostic for mixture curation: for every source, the
    chi-square divergence between its token distribution p and the whole
    corpus's q — ``χ²(p‖q) = Σ_t (p_t − q_t)²/q_t``.  Uses the identity
    ``χ² = Σ_t p_t²/q_t − 1``: the p_t = 0 terms vanish, so only tokens
    PRESENT in a source are ever enumerated (no source × vocabulary grid).
    Each present-token term is the pure integer rational
    ``c_st²·C / (C_s²·c_t)`` evaluated in one fixed double-precision
    order, rounded to nano units FIRST, and summed as integers — so the
    result is independent of summation order and bit-exact against SQL
    (chi-square rather than KL precisely because it needs no ``ln``,
    which has no cross-engine bit guarantee).

    Scale shape: ONE combine-fed exchange builds the (source, token)
    count table (bounded by per-batch distinct pairs); corpus token
    totals and per-source totals are two tiny derived groupbys of that
    table; the vocab-sized token-total map broadcasts once via
    ``ray.put`` (the T5/T6 pattern — reduce-side join above worker-heap
    vocab, same planner split as the linker); the final reduce is a
    #sources-row groupby.  Output: (source, n_tokens, chi2_nano)."""

    def pair_partial(batch: pa.Table) -> pa.Table:
        lists = _split_lower(batch.column(text_col))
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        mask = pc.not_equal(flat, "")
        src = batch.column(group_col).take(parent.filter(mask))
        grouped = (
            pa.table({group_col: src, "token": flat.filter(mask)})
            .group_by([group_col, "token"])
            .aggregate([("token", "count")])
        )
        return pa.table(
            {
                group_col: grouped.column(group_col),
                "token": grouped.column("token"),
                "c": grouped.column("token_count").cast(pa.int64()),
            }
        )

    pairs = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby([group_col, "token"])
        .sum("c")
        .map_batches(
            lambda t: t.rename_columns([group_col, "token", "c"]),
            batch_format="pyarrow",
        )
        .materialize()  # consumed three times below (tok totals, src totals, terms)
    )
    tok_tbl = pairs.groupby("token").sum("c").to_pandas()
    tok_arr = pa.array(tok_tbl["token"].to_numpy(), pa.string())
    tok_tot = tok_tbl["sum(c)"].to_numpy().astype(np.int64)
    src_tbl = pairs.groupby(group_col).sum("c").to_pandas()
    src_tot = dict(zip(src_tbl[group_col], src_tbl["sum(c)"].astype(np.int64)))
    c_total = float(tok_tot.sum())
    ref = ray.put((tok_arr, tok_tot))

    def term(batch: pa.Table) -> pa.Table:
        toks, tots = ray.get(ref)
        idx = pc.index_in(batch.column("token"), toks).to_numpy(zero_copy_only=False)
        c_st = batch.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        c_t = tots[idx].astype(np.float64)
        c_s = np.array(
            [float(src_tot[s]) for s in batch.column(group_col).to_pylist()],
            dtype=np.float64,
        )
        # fixed op order, mirrored in the SQL oracle:
        # floor(((cst*cst)*C) / ((cs*cs)*ct) * 1e9 + 0.5)
        nano = np.floor(
            ((c_st * c_st) * c_total) / ((c_s * c_s) * c_t) * 1000000000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                group_col: batch.column(group_col),
                "term_nano": pa.array(nano, pa.int64()),
            }
        )

    agg = (
        pairs.map_batches(term, batch_format="pyarrow")
        .groupby(group_col)
        .sum("term_nano")
    )

    def finish(batch: pa.Table) -> pa.Table:
        srcs = batch.column(group_col).to_pylist()
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_tokens": pa.array([int(src_tot[s]) for s in srcs], pa.int64()),
                "chi2_nano": pc.subtract(
                    batch.column("sum(term_nano)"), pa.scalar(1000000000, pa.int64())
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# --- token co-occurrence + lift over the top-V vocabulary -------------------

def token_cooccurrence(
    docs: ray.data.Dataset, top_v: int = 50, text_col: str = "text"
) -> ray.data.Dataset:
    """Document-level token association over the ``top_v`` most frequent
    tokens: for every vocabulary pair (a < b), the number of documents
    containing BOTH and the lift ``P(ab) / (P(a)·P(b)) = c_ab·N /
    (c_a·c_b)`` in integer micro-units — the log-free PMI surrogate
    (PMI = ln lift; lift keeps the bit-exact SQL replay, see
    ``corpus_drift`` for the rationale).

    Scale shape: pass 1 is the proven top-k vocabulary selection
    (count desc, token asc); pass 2 builds a boolean presence matrix
    [batch_docs × V] per batch and takes ``Pᵀ·P`` — the per-batch partial
    is a fixed V×V int64 matrix (V=50 → 20 KiB) merged by elementwise
    sum, so NO per-pair rows ever cross the exchange regardless of corpus
    size; diagonal = per-token doc frequencies.  N is total documents
    (including vocab-free ones)."""
    from ray.data.aggregate import AggregateFn

    top = vocab_top_k(docs, k=top_v, text_col=text_col).take_all()
    vocab = [r["token"] for r in top]
    v_arr = pa.array(vocab, pa.string())
    V = len(vocab)
    vref = ray.put(v_arr)

    def acc_block(state, block) -> np.ndarray:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        mat, n = state
        if block.num_rows == 0:
            return (mat, n)
        va = ray.get(vref)
        lists = _split_lower(block.column(text_col))
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        idx = pc.index_in(flat, va)
        ok = pc.is_valid(idx)
        rows = parent.filter(ok).to_numpy(zero_copy_only=False)
        cols = idx.filter(ok).to_numpy(zero_copy_only=False).astype(np.int64)
        presence = np.zeros((block.num_rows, V), dtype=np.int64)
        presence[rows, cols] = 1
        return (mat + presence.T @ presence, n + block.num_rows)

    agg = AggregateFn(
        init=lambda k: (np.zeros((V, V), np.int64), 0),
        merge=lambda a, b: (a[0] + b[0], a[1] + b[1]),
        accumulate_block=acc_block,
        name="cooc",
    )
    mat, n_docs = docs.select_columns([text_col]).aggregate(agg)["cooc"]
    ia, ib = np.triu_indices(V, k=1)
    c_ab = mat[ia, ib]
    keep = c_ab > 0
    ia, ib, c_ab = ia[keep], ib[keep], c_ab[keep]
    c_a = mat[ia, ia].astype(np.float64)
    c_b = mat[ib, ib].astype(np.float64)
    lift = np.floor(
        (c_ab.astype(np.float64) * float(n_docs)) / (c_a * c_b) * 1000000.0 + 0.5
    ).astype(np.int64)
    # canonical pair order: token string asc (vocab rank order differs)
    ta = np.array([vocab[i] for i in ia], dtype=object)
    tb = np.array([vocab[i] for i in ib], dtype=object)
    swap = ta > tb
    ta[swap], tb[swap] = tb[swap], ta[swap].copy()
    out = pa.table(
        {
            "tok_a": pa.array(list(ta), pa.string()),
            "tok_b": pa.array(list(tb), pa.string()),
            "n_docs_both": pa.array(c_ab, pa.int64()),
            "lift_micro": pa.array(lift, pa.int64()),
        }
    )
    return ray.data.from_arrow(out.take(pc.sort_indices(out, [("tok_a", "ascending"), ("tok_b", "ascending")])))


# --- inverted index: term -> ordered posting list ---------------------------

def build_postings(
    docs: ray.data.Dataset, min_df: int = 2, text_col: str = "text"
) -> ray.data.Dataset:
    """Inverted-index build (the offline half of retrieval — ``bm25``
    consumes these statistics query-side): for every token with document
    frequency ≥ ``min_df``, its df, total term frequency, and the FULL
    posting list as a comma-joined doc-id string in ascending doc order.

    Scale shape: one streaming scan pre-reduces (token, doc, tf) inside
    each batch (Arrow hash-aggregate — one row per distinct token per doc
    per batch, and documents never span batches so the pairs are globally
    unique); ONE keyed exchange groups pairs by token hash
    (``hash_partitioned_groups`` — n_parts dispatches, not n_tokens);
    within a partition the posting lists are built with one vectorized
    (token, doc) mergesort + ``binary_join`` per run — no per-token
    Python.  A production index shards each posting list by doc range
    (this row layout is the per-shard segment); the single-row-per-term
    form here is what the value-exact SQL replay compares."""
    from .joins import derive_n_parts, hash_partitioned_groups

    def pair_partial(batch: pa.Table) -> pa.Table:
        lists = _split_lower(batch.column(text_col))
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        mask = pc.not_equal(flat, "")
        grouped = (
            pa.table({"row": parent.filter(mask), "token": flat.filter(mask)})
            .group_by(["row", "token"])
            .aggregate([("token", "count")])
        )
        return pa.table(
            {
                "token": grouped.column("token"),
                "doc_id": batch.column("doc_id").take(grouped.column("row")).cast(pa.int64()),
                "tf": grouped.column("token_count").cast(pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("token", pa.string()),
            ("df", pa.int64()),
            ("total_tf", pa.int64()),
            ("postings", pa.string()),
        ]
    )

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        toks = part.column("token").to_numpy(zero_copy_only=False)
        doc = part.column("doc_id").to_numpy(zero_copy_only=False)
        tf = part.column("tf").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, toks))
        toks, doc, tf = toks[order], doc[order], tf[order]
        breaks = np.ones(len(toks), bool)
        breaks[1:] = toks[1:] != toks[:-1]
        t0 = np.flatnonzero(breaks)
        t1 = np.concatenate([t0[1:], [len(toks)]])
        df = (t1 - t0).astype(np.int64)
        keep = df >= min_df
        if not keep.any():
            return out_schema.empty_table()
        csum = np.concatenate([[0], np.cumsum(tf)])
        total_tf = csum[t1] - csum[t0]
        # one vectorized join: doc ids -> strings, kept runs gathered into
        # a single ListArray, then one binary_join over all lists
        doc_str = pc.cast(pa.array(doc, pa.int64()), pa.string())
        k0, k1 = t0[keep], t1[keep]
        run_lens = k1 - k0
        idx = np.repeat(k0, run_lens) + (
            np.arange(int(run_lens.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(run_lens)[:-1]]), run_lens)
        )
        gathered = doc_str.take(pa.array(idx, pa.int64()))
        offs = np.concatenate([[0], np.cumsum(run_lens)]).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offs), gathered)
        postings = pc.binary_join(la, ",")
        return pa.table(
            {
                "token": pa.array(toks[k0], pa.string()),
                "df": pa.array(df[keep]),
                "total_tf": pa.array(total_tf[keep], pa.int64()),
                "postings": postings,
            }
        )

    pairs = docs.map_batches(pair_partial, batch_format="pyarrow")
    n_parts = derive_n_parts(docs.count(), rows_per_part=4096)
    return hash_partitioned_groups(pairs, ["token"], per_part, n_parts)


# --- set ops on derived keys: vocabulary diff between corpus slices ----------

def vocab_diff(
    docs: ray.data.Dataset,
    source_a: str,
    source_b: str,
    text_col: str = "text",
    group_col: str = "source",
) -> ray.data.Dataset:
    """Set operations (EXCEPT / INTERSECT) on two corpus slices' derived
    vocabularies: every token present in ``source_a`` or ``source_b``
    docs, labeled 'a_only' / 'b_only' / 'both' with per-side counts —
    the domain-vocabulary-diff question mixture curation asks
    ("what does slice A say that slice B never does?").

    Scale shape: one scan pre-reduces (token, side) counts inside each
    batch (Arrow hash-aggregate), ONE token-keyed groupby folds the two
    side counts per token (sum partials — rows shuffled bounded by
    distinct tokens per batch), and the label is a vectorized CASE over
    the folded pair.  The same shape implements EXCEPT (filter a_only)
    and INTERSECT (filter both) on any derived key."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column(group_col)
        keep = pc.or_(pc.equal(src, source_a), pc.equal(src, source_b))
        t = batch.filter(keep)
        if t.num_rows == 0:
            return pa.schema(
                [("token", pa.string()), ("n_a", pa.int64()), ("n_b", pa.int64())]
            ).empty_table()
        lists = _split_lower(t.column(text_col))
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        is_a = pc.equal(t.column(group_col), source_a).take(parent)
        mask = pc.not_equal(flat, "")
        g = (
            pa.table(
                {
                    "token": flat.filter(mask),
                    "n_a": pc.cast(is_a.filter(mask), pa.int64()),
                }
            )
            .group_by(["token"])
            .aggregate([("n_a", "sum"), ("n_a", "count")])
        )
        na = g.column("n_a_sum").cast(pa.int64())
        return pa.table(
            {
                "token": g.column("token"),
                "n_a": na,
                "n_b": pc.subtract(g.column("n_a_count").cast(pa.int64()), na),
            }
        )

    folded = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
    )

    def label(batch: pa.Table) -> pa.Table:
        na = batch.column("n_a").to_numpy(zero_copy_only=False)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False)
        lab = np.where(na == 0, "b_only", np.where(nb == 0, "a_only", "both"))
        return pa.table(
            {
                "token": batch.column("token"),
                "membership": pa.array(lab, pa.string()),
                "n_a": batch.column("n_a"),
                "n_b": batch.column("n_b"),
            }
        )

    return folded.map_batches(label, batch_format="pyarrow").sort("token")


# --- BPE-style greedy pair merging (phrase-vocabulary training) --------------

def bpe_phrases(
    docs: ray.data.Dataset, n_merges: int = 6, text_col: str = "text"
) -> "pa.Table":
    """BPE-style phrase mining (the word-level form of Sennrich et al.'s
    byte-pair-encoding vocabulary training): ``n_merges`` rounds, each
    picking the corpus-wide most frequent adjacent symbol pair (count
    desc, then x asc, y asc) and rewriting every sequence with the merged
    symbol ``x_y``.  Returns the merge table (round, x, y, merged, cnt) —
    the trained artifact a tokenizer/phrase-indexer consumes.

    Determinism contract: rewriting is literal non-overlapping
    left-to-right ``replace(' x y ', ' x_y ')`` on single-space-padded
    sequences — the exact semantics of both Arrow ``replace_substring``
    and SQL ``replace``, so every round (counts, argmax, rewrite) is
    bit-identical cross-engine and the whole training unrolls into a
    MATERIALIZED-CTE SQL replay.

    Scale shape per round: ONE combine-fed pair-count exchange (per-batch
    Arrow hash-aggregate bounds shuffled rows at distinct pairs per
    batch), a driver-side top-1 of the count table (sort+limit — the
    only cross-round state is ONE pair), and a streaming rewrite scan;
    sequences re-materialize per round (the k-core/PageRank static-data
    iteration pattern)."""
    from ray.data.aggregate import Sum

    def to_seq(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "seq": pc.binary_join_element_wise(
                    " ", pc.utf8_lower(batch.column(text_col)), " ", ""
                ),
            }
        )

    seqs = docs.map_batches(to_seq, batch_format="pyarrow").materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch.column("seq"), " ")
        la = lists.combine_chunks()
        flat = la.flatten()
        parent = pc.list_parent_indices(lists).combine_chunks().to_numpy(zero_copy_only=False)
        L = len(flat)
        empty = pa.schema([("x", pa.string()), ("y", pa.string()), ("cnt", pa.int64())]).empty_table()
        if L < 2:
            return empty
        x = flat.slice(0, L - 1)
        y = flat.slice(1, L - 1)
        ok = pa.array(
            (parent[:-1] == parent[1:])
        )
        t = pa.table({"x": x, "y": y}).filter(ok)
        t = t.filter(
            pc.and_(pc.not_equal(t.column("x"), ""), pc.not_equal(t.column("y"), ""))
        )
        if t.num_rows == 0:
            return empty
        g = t.group_by(["x", "y"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "x": g.column("x"),
                "y": g.column("y"),
                "cnt": g.column("count_all").cast(pa.int64()),
            }
        )

    def local_top1(batch: pa.Table) -> pa.Table:
        """Per-batch argmax over the ALREADY-AGGREGATED count table
        (post-groupby batches hold disjoint pairs, so a local top-1 per
        batch plus a driver pick is exact) — replaces a per-round
        sort().limit(1) all-to-all with a batches-sized fold."""
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(
            batch,
            sort_keys=[("cnt", "descending"), ("x", "ascending"), ("y", "ascending")],
        )
        return batch.take(idx[:1])

    merges = []
    for r in range(1, n_merges + 1):
        cands = (
            seqs.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["x", "y"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .map_batches(local_top1, batch_format="pyarrow")
            .take_all()
        )
        if not cands:
            break
        cands.sort(key=lambda t: (-int(t["cnt"]), t["x"], t["y"]))
        top = cands
        x, y, cnt = top[0]["x"], top[0]["y"], int(top[0]["cnt"])
        merged = f"{x}_{y}"
        merges.append({"round": r, "x": x, "y": y, "merged": merged, "cnt": cnt})

        def rewrite(batch: pa.Table, _x=x, _y=y, _m=merged) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "seq": pc.replace_substring(
                        batch.column("seq"), pattern=f" {_x} {_y} ", replacement=f" {_m} "
                    ),
                }
            )

        seqs = seqs.map_batches(rewrite, batch_format="pyarrow").materialize()

    return pa.Table.from_pylist(
        merges,
        schema=pa.schema(
            [
                ("round", pa.int64()),
                ("x", pa.string()),
                ("y", pa.string()),
                ("merged", pa.string()),
                ("cnt", pa.int64()),
            ]
        ),
    )


def bpe_apply(
    docs: ray.data.Dataset, merges: "pa.Table", text_col: str = "text"
) -> ray.data.Dataset:
    """Tokenizer APPLY: encode every document with a trained
    :func:`bpe_phrases` merge table (replaces applied in round order —
    exactly how a BPE vocabulary is used on new text) and report the
    per-doc symbol count before and after — the compression-ratio signal
    that sizes a token budget.

    One streaming scan; each merge is a vectorized literal
    ``replace_substring`` over the padded sequence (the same
    non-overlap semantics the training rounds and the SQL replay use).
    No exchange at all."""
    pairs = [
        (r["x"], r["y"], r["merged"])
        for r in sorted(merges.to_pylist(), key=lambda r: r["round"])
    ]

    def encode(batch: pa.Table) -> pa.Table:
        seq = pc.binary_join_element_wise(
            " ", pc.utf8_lower(batch.column(text_col)), " ", ""
        )
        before = pc.list_value_length(pc.split_pattern(batch.column(text_col), " ")).cast(
            pa.int64()
        )
        for x, y, m in pairs:
            seq = pc.replace_substring(seq, pattern=f" {x} {y} ", replacement=f" {m} ")
        toks = pc.split_pattern(seq, " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        nonempty = pc.not_equal(flat, "")
        after = np.zeros(batch.num_rows, np.int64)
        np.add.at(
            after,
            parent.filter(nonempty).to_numpy(zero_copy_only=False),
            1,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": before,
                "n_symbols": pa.array(after),
            }
        )

    return docs.map_batches(encode, batch_format="pyarrow")


def top_terms_by_source(
    docs: ray.data.Dataset, k: int = 5, text_col: str = "text", group_col: str = "source"
) -> ray.data.Dataset:
    """Per-source top-k terms (the mixture profile curation dashboards
    show): token counts per source, ranked within source by (count desc,
    token asc) — a pure composition of the engine's combine-fed pair
    counts and the bounded per-group rank (``top_k_per_group``'s
    shape over the already-aggregated pair table)."""
    from ray.data.aggregate import Sum

    from .joins import derive_n_parts, hash_partitioned_groups

    def pair_partial(batch: pa.Table) -> pa.Table:
        lists = _split_lower(batch.column(text_col))
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        mask = pc.not_equal(flat, "")
        g = (
            pa.table(
                {
                    group_col: batch.column(group_col).take(parent.filter(mask)),
                    "token": flat.filter(mask),
                }
            )
            .group_by([group_col, "token"])
            .aggregate([("token", "count")])
        )
        return pa.table(
            {
                group_col: g.column(group_col),
                "token": g.column("token"),
                "n": g.column("token_count").cast(pa.int64()),
            }
        )

    pairs = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby([group_col, "token"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_part(part: pa.Table) -> pa.Table:
        if "part" in part.column_names:
            part = part.drop_columns(["part"])
        if part.num_rows == 0:
            return part.append_column("rank", pa.array([], pa.int64()))
        s = part.take(
            pc.sort_indices(
                part,
                sort_keys=[(group_col, "ascending"), ("n", "descending"), ("token", "ascending")],
            )
        )
        g = s.column(group_col).to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], g[1:] != g[:-1]])
        starts = np.flatnonzero(first)
        rank = np.arange(len(g), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(g)]]))
        ) + 1
        s = s.append_column("rank", pa.array(rank))
        return s.filter(pa.array(rank <= k))

    n_parts = derive_n_parts(docs.count(), rows_per_part=65536)
    return hash_partitioned_groups(pairs, [group_col], per_part, n_parts).sort(
        [group_col, "rank"]
    )


def lexical_diversity(
    docs: ray.data.Dataset, source_col: str = "source", text_col: str = "text"
) -> ray.data.Dataset:
    """Per-source lexical diversity: token count, type (distinct-token)
    count, type-token ratio and hapax-legomenon share — the
    repetitiveness signal that separates boilerplate-heavy crawls from
    natural prose (a low TTR source is a dedup/boilerplate suspect
    before any n-gram pass runs).  Ratios in exact integer milli,
    round-half-up: ttr = (2000·types + tokens) // (2·tokens), hapax
    share likewise over types.

    Scale shape: per-batch (source, token) Arrow value-count partials
    (the vocab_top_k split, with the source repeated by list length —
    no per-row loop) bound the first exchange at distinct pairs per
    batch; after the summed pair fold a second combine-fed partial
    reduces each batch to ≤ |sources| (tokens, types, hapax) triples;
    the driver folds |sources| rows."""
    from ray.data.aggregate import Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        lists = _split_lower(batch.column(text_col)).combine_chunks()
        toks = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch.column(source_col).to_numpy(zero_copy_only=False)
        rep = pa.array(np.repeat(src, lens))
        t = pa.table({"source": rep, "token": toks})
        t = t.filter(pc.not_equal(t.column("token"), ""))
        g = t.group_by(["source", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g.column("source"),
                "token": g.column("token"),
                "c": g.column("count_all").cast(pa.int64()),
            }
        )

    pair_counts = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def source_partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(src, return_inverse=True)
        tokens = np.zeros(len(uniq), np.int64)
        np.add.at(tokens, inv, c)
        types = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        hapax = np.bincount(inv[c == 1], minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "source": pa.array([str(x) for x in uniq], pa.string()),
                "n_tokens": pa.array(tokens, pa.int64()),
                "n_types": pa.array(types, pa.int64()),
                "n_hapax": pa.array(hapax, pa.int64()),
            }
        )

    rows = (
        pair_counts.map_batches(source_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_types", alias_name="n_types"),
            Sum("n_hapax", alias_name="n_hapax"),
        )
        .take_all()
    )  # ≤ |sources| rows
    rows.sort(key=lambda r: r["source"])
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([r["source"] for r in rows], pa.string()),
                "n_tokens": pa.array([int(r["n_tokens"]) for r in rows], pa.int64()),
                "n_types": pa.array([int(r["n_types"]) for r in rows], pa.int64()),
                "ttr_milli": pa.array(
                    [
                        (2000 * int(r["n_types"]) + int(r["n_tokens"]))
                        // (2 * int(r["n_tokens"]))
                        if int(r["n_tokens"]) > 0
                        else 0
                        for r in rows
                    ],
                    pa.int64(),
                ),
                "hapax_milli": pa.array(
                    [
                        (2000 * int(r["n_hapax"]) + int(r["n_types"]))
                        // (2 * int(r["n_types"]))
                        if int(r["n_types"]) > 0
                        else 0
                        for r in rows
                    ],
                    pa.int64(),
                ),
            }
        )
    )


def dup_rate_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source exact-duplicate rate (which crawl is feeding the
    pipeline copies: docs whose normalized text fingerprint appears
    more than once WITHIN the source, in round-half-up integer milli).
    Fingerprint = md5 of the lowercased text — the fingerprints-query
    definition, so the two audits agree by construction.

    Scale shape: per-batch (source, fp-digest) distinct partials (16-byte
    digests travel, never text — the distinct_texts discipline), ONE
    (source, fp) exchange whose per-partition fold counts each
    fingerprint's multiplicity and emits ≤ |sources| (docs, dup_docs)
    counter rows; a final aggregate-sized groupby folds cross-partition
    counters.  A fingerprint's rows co-locate because the exchange keys
    on (source, fp) itself."""
    import hashlib

    from ray.data.aggregate import Sum

    from .joins import derive_n_parts, hash_partitioned_groups

    def partial(batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch.column("text")).to_pylist()
        fps = [hashlib.md5((t or "").encode()).digest() for t in texts]
        t = pa.table(
            {
                "source": batch.column("source"),
                "fp": pa.array(fps, pa.binary(16)),
            }
        )
        g = t.group_by(["source", "fp"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g.column("source"),
                "fp": g.column("fp"),
                "c": g.column("count_all").cast(pa.int64()),
            }
        )

    def per_part(part: pa.Table) -> pa.Table:
        if "part" in part.column_names:
            part = part.drop_columns(["part"])
        if part.num_rows == 0:
            return pa.schema(
                [
                    ("source", pa.string()),
                    ("n_docs", pa.int64()),
                    ("n_dup_docs", pa.int64()),
                ]
            ).empty_table()
        s = part.take(
            pc.sort_indices(part, sort_keys=[("source", "ascending"), ("fp", "ascending")])
        )
        src = s.column("source").to_numpy(zero_copy_only=False)
        fp = s.column("fp").to_numpy(zero_copy_only=False)
        c = s.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        # merge cross-batch runs of the same (source, fp)
        first = np.r_[True, (src[1:] != src[:-1]) | (fp[1:] != fp[:-1])]
        runs = np.flatnonzero(first)
        c = np.add.reduceat(c, runs)
        src = src[runs]
        uniq, inv = np.unique(src, return_inverse=True)
        docs = np.zeros(len(uniq), np.int64)
        np.add.at(docs, inv, c)
        dup = np.zeros(len(uniq), np.int64)
        np.add.at(dup, inv, np.where(c > 1, c, 0))
        return pa.table(
            {
                "source": pa.array([str(x) for x in uniq], pa.string()),
                "n_docs": pa.array(docs, pa.int64()),
                "n_dup_docs": pa.array(dup, pa.int64()),
            }
        )

    pr = docs.map_batches(partial, batch_format="pyarrow")
    n_parts = derive_n_parts(docs.count(), rows_per_part=65536)
    folded = (
        hash_partitioned_groups(pr, ["source", "fp"], per_part, n_parts)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_dup_docs", alias_name="n_dup_docs"),
        )
        .take_all()
    )
    folded.sort(key=lambda r: r["source"])
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([r["source"] for r in folded], pa.string()),
                "n_docs": pa.array([int(r["n_docs"]) for r in folded], pa.int64()),
                "n_dup_docs": pa.array(
                    [int(r["n_dup_docs"]) for r in folded], pa.int64()
                ),
                "dup_milli": pa.array(
                    [
                        (2000 * int(r["n_dup_docs"]) + int(r["n_docs"]))
                        // (2 * int(r["n_docs"]))
                        if int(r["n_docs"]) > 0
                        else 0
                        for r in folded
                    ],
                    pa.int64(),
                ),
            }
        )
    )


def heaps_law(docs: ray.data.Dataset) -> "pa.Table":
    """Heaps'-law vocabulary growth: distinct-token counts at four
    nested doc_id-ordered corpus prefixes (⅛, ¼, ½, all) and the
    growth exponent β from V(n) ≈ K·nᵝ — the corpus-linguistics
    diagnostic that says how fast new vocabulary keeps arriving (β≈1:
    every doc novel; β≈0: vocabulary saturated).  β is the OLS slope
    over the four (ln n, ln V) points with each ln nano-rounded via
    ``math.log`` BEFORE the exact integer sufficient statistics (the
    cat_dependence discipline), emitted as round-half-up milli.

    Scale shape: four filtered scans, each folding to per-batch
    distinct-token partials and one vocabulary-bounded groupby — the
    vocab_top100 exchange class; the driver sees 4 scalar pairs."""
    import math

    import pyarrow.compute as pc_
    from ray.data.aggregate import Max

    mx = docs.map_batches(
        lambda b: pa.table(
            {"m": pa.array(
                [int(pc_.max(b.column("doc_id")).as_py())] if b.num_rows else [],
                pa.int64(),
            )}
        ),
        batch_format="pyarrow",
    ).aggregate(Max("m", alias_name="m"))
    schema = pa.schema(
        [
            ("checkpoint", pa.int64()),
            ("n_docs", pa.int64()),
            ("v_tokens", pa.int64()),
            ("beta_milli", pa.int64()),
        ]
    )
    if not mx or mx.get("m") is None:
        return schema.empty_table()
    top = int(mx["m"]) + 1
    pts = []
    for k in (1, 2, 4, 8):
        thr = top * k // 8
        sub = docs.filter(expr=f"doc_id < {thr}")

        def tok_partial(batch: pa.Table) -> pa.Table:
            toks = pc_.list_flatten(
                pc_.split_pattern(
                    pc_.utf8_lower(batch.column("text").combine_chunks()), " "
                )
            )
            toks = toks.filter(pc_.not_equal(toks, ""))
            return pa.table({"token": pc_.unique(toks)})

        v = (
            sub.map_batches(tok_partial, batch_format="pyarrow")
            .groupby("token")
            .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
            .count()
        )
        n = sub.count()
        # Tiny-corpus guard: with < 8 docs the ⅛ prefix is empty (n=0)
        # and a token-less prefix gives v=0; either would feed ln(0).
        # Skip such checkpoints — the SQL oracle filters the same rows.
        if n > 0 and int(v) > 0:
            pts.append((k, n, int(v)))
    if not pts:
        return schema.empty_table()

    def L(x: int) -> int:
        return int(math.floor(math.log(float(x)) * 1e9 + 0.5))

    xs = [L(n) for _, n, _ in pts]
    ys = [L(v) for _, _, v in pts]
    m = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = m * sxy - sx * sy
    den = m * sxx - sx * sx
    beta_milli = (2000 * num + den) // (2 * den) if den else 0
    return pa.table(
        {
            "checkpoint": pa.array([p[0] for p in pts], pa.int64()),
            "n_docs": pa.array([p[1] for p in pts], pa.int64()),
            "v_tokens": pa.array([p[2] for p in pts], pa.int64()),
            "beta_milli": pa.array([beta_milli] * m, pa.int64()),
        }
    )


def zipf_law(docs: ray.data.Dataset, k: int = 100) -> "pa.Table":
    """Zipf rank-frequency exponent over the top-``k`` vocabulary —
    Heaps' companion (frequency ≈ C·rank⁻ˢ; natural text sits near
    s ≈ 1): the distributed top-k fold is :func:`vocab_top_k` verbatim,
    then s is the NEGATED integer-OLS slope over the k nano-rounded
    (ln rank, ln cnt) points (the heaps_law discipline), round-half-up
    milli.  Output one row per rank plus the constant exponent column.

    Scale shape: exactly vocab_top_k's — the exchange is vocabulary-
    bounded; the driver sees k rows."""
    import math

    top = vocab_top_k(docs, k=k)
    rows = top.to_pylist() if hasattr(top, "to_pylist") else top.take_all()
    schema = pa.schema(
        [
            ("rank", pa.int64()),
            ("token", pa.string()),
            ("cnt", pa.int64()),
            ("s_milli", pa.int64()),
        ]
    )
    if not rows:
        return schema.empty_table()

    def L(x: int) -> int:
        return int(math.floor(math.log(float(x)) * 1e9 + 0.5))

    xs = [L(r + 1) for r in range(len(rows))]
    ys = [L(int(t["cnt"])) for t in rows]
    m = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = m * sxy - sx * sy
    den = m * sxx - sx * sx
    # slope is negative for Zipfian data; s = −slope, round-half-up on
    # the POSITIVE value (mirrored in SQL)
    s_milli = (2000 * (-num) + den) // (2 * den) if den else 0
    return pa.table(
        {
            "rank": pa.array([r + 1 for r in range(m)], pa.int64()),
            "token": pa.array([t["token"] for t in rows], pa.string()),
            "cnt": pa.array([int(t["cnt"]) for t in rows], pa.int64()),
            "s_milli": pa.array([s_milli] * m, pa.int64()),
        }
    )


def char_entropy(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document character-distribution entropy — the classic
    gibberish / encoding-noise quality signal (natural text sits near
    4.1-4.4 bits ≈ 2.9-3.0 nats; base64 blobs and key-mash noise score
    high, repeated-char padding scores near 0).  Exact integer-nano
    convention (the markov_entropy discipline): per distinct (doc, char)
    count c in a doc of n codepoints, term = c·(L(n) − L(c)) with
    ``L(x) = floor(ln(x)·1e9 + 0.5)`` via ``math.log`` (bit-identical to
    DuckDB ``ln``), then H_nano = (2·Σterm + n) // (2·n) — every sum is
    over exact integers, so block layout and summation order cannot move
    the result.  Output (doc_id, n_chars, n_distinct, entropy_nano).

    Scale shape: ONE streaming scan; each batch decodes its text to a
    flat codepoint array (utf-32 view), folds per-(doc, char) counts
    with one ``np.unique`` on a packed (doc, codepoint) key, and
    finalizes per doc with segmented reduceats — no exchange at all."""
    import math

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chars", pa.int64()),
            ("n_distinct", pa.int64()),
            ("entropy_nano", pa.int64()),
        ]
    )

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        n_docs = len(texts)
        ent = np.zeros(n_docs, dtype=np.int64)
        ndist = np.zeros(n_docs, dtype=np.int64)
        if len(cp):
            key = (doc_idx << np.int64(32)) | cp.astype(np.int64)
            uk, cnt = np.unique(key, return_counts=True)
            ud = (uk >> np.int64(32)).astype(np.int64)
            # L over DISTINCT values only, via math.log (NOT np.log — the
            # engine's ln convention is bit-matched to DuckDB through
            # libm; numpy's SIMD log can differ in the last ulp)
            def L_arr(vals: np.ndarray) -> np.ndarray:
                uv = np.unique(vals)
                lv = np.array(
                    [int(math.floor(math.log(float(v)) * 1e9 + 0.5)) for v in uv],
                    dtype=np.int64,
                )
                return lv[np.searchsorted(uv, vals)]
            Lc = L_arr(cnt)
            Ln_doc = L_arr(lens[lens > 0])
            Ln_full = np.zeros(n_docs, dtype=np.int64)
            Ln_full[lens > 0] = Ln_doc
            term = cnt * (Ln_full[ud] - Lc)
            starts = np.flatnonzero(np.r_[True, ud[1:] != ud[:-1]])
            num = np.add.reduceat(term, starts)
            owners = ud[starts]
            nn = lens[owners]
            ent[owners] = (2 * num + nn) // (2 * nn)
            ndist[owners] = np.diff(np.r_[starts, len(ud)])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(lens, pa.int64()),
                "n_distinct": pa.array(ndist, pa.int64()),
                "entropy_nano": pa.array(ent, pa.int64()),
            }
        )

    return docs.map_batches(kernel, batch_format="pyarrow")
