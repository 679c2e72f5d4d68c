"""Resumable sharded KG run: the scale harness around the streaming
pipeline (north rule: per-partition lineage + counters, failed shards
resume without recomputation).

Layout under ``out_dir``::

    manifest.jsonl                      # one entry per (stage, shard)
    sentences/shard=i/part.parquet      # stage "sentences" output
    counts/shard=i/part.parquet         # per-shard (kind, token, count)
    vocab/{word,dep,pos}.parquet        # finalized global vocab (barrier)
    triples/shard=i/part.parquet        # stage "triples" output
    entities/ adjacency/                # final materialize (ray write_parquet)

Shard granularity is the resume unit: each shard is itself a parallel Ray
Data pipeline (blocks stream through actor pools), so one shard ≈ one
"partition" of the 100 TB input — on a real cluster these would be ranges
of Lance fragments; here, deterministic ranges of the synthetic corpus or
one shard per input parquet file.
"""

from __future__ import annotations

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..config import KGConfig
from ..nlp.sdp import finalize_vocab
from ..state.lineage import Manifest, config_fingerprint, write_shard
from .kg import KGPipeline, adjacency_from_triples, entities_from_triples, vocab_table


def _concat(ds: ray.data.Dataset, schema: pa.Schema | None = None) -> pa.Table:
    tabs = [b for b in ds.iter_batches(batch_format="pyarrow")]
    if not tabs:
        return schema.empty_table() if schema is not None else pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


class ShardedKGRunner:
    def __init__(
        self,
        out_dir: str,
        n_shards: int,
        docs_for_shard,  # Callable[[int], ray.data.Dataset]
        cfg: KGConfig | None = None,
    ) -> None:
        self.out_dir = out_dir
        self.n_shards = n_shards
        self.docs_for_shard = docs_for_shard
        self.cfg = cfg or KGConfig()
        self.pipe = KGPipeline(self.cfg)
        self.manifest = Manifest(out_dir)
        self.fp = config_fingerprint(self.cfg)
        self.recomputed: list[tuple[str, int]] = []  # visibility for tests/metrics

    # -- stage 1: parse + token counts, per shard ---------------------------

    def _run_sentences(self, shard: int) -> None:
        counts_path = os.path.join(self.out_dir, "counts", f"shard={shard}", "part.parquet")
        if self.manifest.complete("sentences", shard, self.fp, self.out_dir) and os.path.exists(counts_path):
            return
        self.recomputed.append(("sentences", shard))
        docs = self.docs_for_shard(shard)
        sent_tab = _concat(self.pipe.sentences(docs))
        span_checksum = 0
        for h in sent_tab.column("span_hash").to_pylist():
            span_checksum ^= h
        write_shard(sent_tab, self.out_dir, "sentences", shard)

        wc: Counter = Counter()
        dc: Counter = Counter()
        pc_: Counter = Counter()
        for tokens in sent_tab.column("tokens").to_pylist():
            for t in tokens:
                wc[t["text"].lower()] += 1
                dc[t["dep"]] += 1
                pc_[t["pos"]] += 1
        rows = (
            [("word", t, c) for t, c in wc.items()]
            + [("dep", t, c) for t, c in dc.items()]
            + [("pos", t, c) for t, c in pc_.items()]
        )
        counts = pa.Table.from_pydict(
            {
                "kind": [r[0] for r in rows],
                "token": [r[1] for r in rows],
                "count": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        write_shard(counts, self.out_dir, "counts", shard)
        self.manifest.append(
            {
                "stage": "sentences",
                "shard": shard,
                "status": "done",
                "fingerprint": self.fp,
                "rows": sent_tab.num_rows,
                "distinct_tokens": len(wc),
                "span_checksum": span_checksum,
            }
        )

    # -- barrier: global vocab ---------------------------------------------

    def _finalize_vocab(self) -> tuple:
        vdir = os.path.join(self.out_dir, "vocab")
        os.makedirs(vdir, exist_ok=True)
        counters = {"word": Counter(), "dep": Counter(), "pos": Counter()}
        for shard in range(self.n_shards):
            t = pq.read_table(os.path.join(self.out_dir, "counts", f"shard={shard}", "part.parquet"))
            for kind, token, count in zip(
                t.column("kind").to_pylist(), t.column("token").to_pylist(), t.column("count").to_pylist()
            ):
                counters[kind][token] += count
        word = finalize_vocab(
            counters["word"], vocab_limit=self.cfg.vocab_limit, min_count=self.cfg.min_count, oov_count=self.cfg.oov_count
        )
        dep = finalize_vocab(counters["dep"], oov_count=self.cfg.oov_count)
        pos = finalize_vocab(counters["pos"], oov_count=self.cfg.oov_count)
        for name, (vocab, _, dist) in (("word", word), ("dep", dep), ("pos", pos)):
            pq.write_table(vocab_table(vocab, dist), os.path.join(vdir, f"{name}.parquet"))
        return word, dep, pos

    # -- stage 2: extract + score, per shard --------------------------------

    def _run_triples(self, shard: int, vocabs) -> None:
        if self.manifest.complete("triples", shard, self.fp, self.out_dir):
            return
        self.recomputed.append(("triples", shard))
        sentences = ray.data.read_parquet(
            os.path.join(self.out_dir, "sentences", f"shard={shard}")
        )
        encoded = self.pipe.encoded(sentences, vocabs)
        enc_tab = _concat(encoded)
        verdicts = Counter(enc_tab.column("verdict").to_pylist())
        triples = self.pipe.triples(ray.data.from_arrow(enc_tab), vocabs)
        trip_tab = _concat(triples)
        span_checksum = 0
        for h in set(trip_tab.column("span_hash").to_pylist()):
            span_checksum ^= h
        write_shard(trip_tab, self.out_dir, "triples", shard)
        self.manifest.append(
            {
                "stage": "triples",
                "shard": shard,
                "status": "done",
                "fingerprint": self.fp,
                "candidates": enc_tab.num_rows,
                "good": verdicts.get("GOOD", 0),
                "bad": verdicts.get("BAD", 0),
                "rows": trip_tab.num_rows,
                "span_checksum": span_checksum,
            }
        )

    # -- final: canonicalize + materialize ----------------------------------

    def run(self) -> dict:
        self.recomputed = []
        for shard in range(self.n_shards):
            self._run_sentences(shard)
        vocabs = self._finalize_vocab()
        for shard in range(self.n_shards):
            self._run_triples(shard, vocabs)
        triples = ray.data.read_parquet(os.path.join(self.out_dir, "triples"))
        import shutil

        for name, ds in (
            ("entities", entities_from_triples(triples)),
            ("adjacency", adjacency_from_triples(triples)),
        ):
            d = os.path.join(self.out_dir, name)
            shutil.rmtree(d, ignore_errors=True)
            ds.write_parquet(d)
        return {
            "triples": triples,
            "entities": ray.data.read_parquet(os.path.join(self.out_dir, "entities")),
            "adjacency": ray.data.read_parquet(os.path.join(self.out_dir, "adjacency")),
            "recomputed": list(self.recomputed),
            "vocabs": vocabs,
        }
