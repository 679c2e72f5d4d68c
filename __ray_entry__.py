"""Driver contract: entry() smoke, queries() per-operator pipelines, and
oracle_sql() DuckDB equivalents (run side-by-side at sf=0.01).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

Design notes:
* Money/float aggregates are returned as integer cents (exact hash
  equality with the SQL oracle — no float-sum rounding drift).
* The KG pipeline's input table (interleaved text+media docs per
  BASELINE.json input_hint) does not exist in the benchmark set, so the
  ``kg_*`` queries synthesize it deterministically (seeded pure function
  of doc index) — they are rows-only checks (no SQL equivalent for
  parsing/SDP extraction).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

KNN_QUERY_IDS = [0, 1, 2, 3, 4]
KG_DOCS = 300  # synthetic interleaved docs for the kg_* rows-only queries


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def entry() -> Any:
    """Flagship KG pipeline at sf0.001: plain benchmark documents wrapped
    into the interleaved-span shape, unioned with a deterministic synthetic
    interleaved corpus (which carries media spans + known triples), run
    end-to-end extract → link → canonicalize → materialize."""
    from relation_extraction_ray.pipelines.kg import KGPipeline, documents_from_plain_text
    from relation_extraction_ray.sources.synth import documents_dataset

    plain = documents_from_plain_text(
        _read("/root/testdata/sf0.001", "documents", columns=["doc_id", "text"])
    )
    synth = documents_dataset(KG_DOCS, override_num_blocks=8)
    out = KGPipeline().run(plain.union(synth))
    return out["adjacency"]


# ---------------------------------------------------------------------------


def _q_vocab(sf_dir: str):
    from relation_extraction_ray.functions.text import vocab_top_k

    return vocab_top_k(_read(sf_dir, "documents", columns=["text"]), k=100)


def _q_doc_stats(sf_dir: str):
    from relation_extraction_ray.functions.text import doc_stats_by_source

    return doc_stats_by_source(_read(sf_dir, "documents", columns=["source", "text"]))


def _q_fingerprints(sf_dir: str):
    from relation_extraction_ray.functions.text import fingerprints

    return fingerprints(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_quality(sf_dir: str):
    from relation_extraction_ray.functions.text import quality_features

    return quality_features(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_dedup_exact(sf_dir: str):
    from relation_extraction_ray.functions.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_knn(sf_dir: str):
    from relation_extraction_ray.functions.ann import knn_brute_force

    return knn_brute_force(_read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), KNN_QUERY_IDS, k=10)


def _q_pricing(sf_dir: str):
    from relation_extraction_ray.functions.relational import pricing_summary

    return pricing_summary(
        _read(
            sf_dir,
            "lineitem",
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        )
    )


def _q_revenue(sf_dir: str):
    from relation_extraction_ray.functions.relational import revenue_by_segment

    return revenue_by_segment(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]),
    )


def _q_top_orders(sf_dir: str):
    from relation_extraction_ray.functions.relational import top_orders

    return top_orders(_read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]), k=10)


def _q_events(sf_dir: str):
    from relation_extraction_ray.functions.relational import events_by_day

    return events_by_day(_read(sf_dir, "events", columns=["event_id", "ts", "event_type"]))


def _q_running_totals(sf_dir: str):
    from relation_extraction_ray.functions.relational import user_running_totals

    return user_running_totals(_read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]))


def _q_asof_join(sf_dir: str):
    from relation_extraction_ray.functions.relational import asof_prior_event

    return asof_prior_event(
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    )


def _q_sample(sf_dir: str):
    from relation_extraction_ray.functions.relational import deterministic_sample

    return deterministic_sample(_read(sf_dir, "documents", columns=["doc_id"]), "doc_id", pct=20)


def _q_distinct_texts(sf_dir: str):
    from relation_extraction_ray.functions.relational import distinct_texts

    return distinct_texts(_read(sf_dir, "documents", columns=["text"]))


# --- rows-only (no SQL equivalent) -----------------------------------------


def _q_kg_triples(sf_dir: str):
    from relation_extraction_ray.pipelines.kg import KGPipeline
    from relation_extraction_ray.sources.synth import documents_dataset

    return KGPipeline().run(documents_dataset(KG_DOCS, override_num_blocks=8))["triples"]


def _q_kg_adjacency(sf_dir: str):
    from relation_extraction_ray.pipelines.kg import KGPipeline
    from relation_extraction_ray.sources.synth import documents_dataset

    return KGPipeline().run(documents_dataset(KG_DOCS, override_num_blocks=8))["adjacency"]


def _q_dedup_minhash(sf_dir: str):
    from relation_extraction_ray.functions.dedup import minhash_candidate_pairs, verify_jaccard

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return verify_jaccard(minhash_candidate_pairs(docs), docs, threshold=0.8)


def _q_simhash(sf_dir: str):
    from relation_extraction_ray.functions.dedup import simhash_table

    return simhash_table(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_lang_id(sf_dir: str):
    from relation_extraction_ray.functions.text import lang_id

    return lang_id(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_kg_linked(sf_dir: str):
    """Triples with KB-linked entity ids (entity-link disambiguator actor
    pool over a broadcast KB)."""
    from relation_extraction_ray.pipelines.kg import KGPipeline
    from relation_extraction_ray.sources.synth import documents_dataset
    from relation_extraction_ray.state.linker import build_kb, link_triples, synth_kb

    out = KGPipeline().run(documents_dataset(KG_DOCS, override_num_blocks=8))
    return link_triples(out["triples"], build_kb(synth_kb()))


def _q_media_features(sf_dir: str):
    """Multimodal span decode/feature plumbing over the interleaved corpus."""
    from relation_extraction_ray.sources.synth import documents_dataset
    from relation_extraction_ray.stages.media import media_features

    return media_features(documents_dataset(KG_DOCS, override_num_blocks=8))


def _q_supervised_eval(sf_dir: str):
    """SemEval-style supervised classification + official-scorer-style
    metrics (macro/micro P-R-F1, Other excluded) as a one-row table."""
    import pandas as pd

    import ray.data as rd

    from relation_extraction_ray.config import KGConfig
    from relation_extraction_ray.eval import evaluate_classification
    from relation_extraction_ray.pipelines.supervised import classify
    from relation_extraction_ray.sources.semeval import labeled_sentences_table, parsed_records

    preds = classify(parsed_records(rd.from_arrow(labeled_sentences_table(500))), KGConfig())
    m = evaluate_classification(preds)
    return pd.DataFrame(
        [
            {
                "macro_f1": round(m["macro_f1"], 6),
                "micro_f1": round(m["micro_f1"], 6),
                "macro_precision": round(m["macro_precision"], 6),
                "macro_recall": round(m["macro_recall"], 6),
            }
        ]
    )


def _q_knn_lsh(sf_dir: str):
    from relation_extraction_ray.functions.ann import knn_lsh

    return knn_lsh(_read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), KNN_QUERY_IDS, k=10)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "vocab_top100": _q_vocab,
        "doc_stats": _q_doc_stats,
        "fingerprints": _q_fingerprints,
        "quality": _q_quality,
        "dedup_exact": _q_dedup_exact,
        "knn_top10": _q_knn,
        "pricing_summary": _q_pricing,
        "revenue_by_segment": _q_revenue,
        "top_orders": _q_top_orders,
        "events_by_day": _q_events,
        "running_totals": _q_running_totals,
        "asof_join": _q_asof_join,
        "sample_docs": _q_sample,
        "distinct_texts": _q_distinct_texts,
        "kg_triples": _q_kg_triples,
        "kg_adjacency": _q_kg_adjacency,
        "dedup_minhash": _q_dedup_minhash,
        "simhash": _q_simhash,
        "lang_id": _q_lang_id,
        "knn_lsh": _q_knn_lsh,
        "kg_linked": _q_kg_linked,
        "media_features": _q_media_features,
        "supervised_eval": _q_supervised_eval,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "vocab_top100": """
            SELECT token, cnt FROM (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
              WHERE token <> ''
              GROUP BY token)
            ORDER BY cnt DESC, token ASC LIMIT 100
        """,
        "doc_stats": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
            FROM documents GROUP BY source ORDER BY source
        """,
        "fingerprints": """
            SELECT doc_id, md5(lower(text)) AS fp FROM documents
        """,
        "quality": """
            SELECT doc_id,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS n_uniq,
                   CAST(coalesce(list_max(list_transform(string_split(lower(text), ' '), t -> length(t))), 0) AS BIGINT) AS max_token_len
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(text) AS h, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY md5(text)
        """,
        "knn_top10": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
              FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
            ), e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
              FROM embeddings
            )
            SELECT query_id, neighbor_id, rank FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     CAST(row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.emb, e.emb) DESC, e.vec_id ASC
                     ) AS BIGINT) AS rank
              FROM q, e WHERE e.vec_id <> q.vec_id)
            WHERE rank <= 10
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS count_order,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_tenk
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_segment": """
            SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "top_orders": """
            SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
            FROM orders ORDER BY o_totalprice_cents DESC, o_orderkey ASC LIMIT 10
        """,
        "events_by_day": """
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS n,
                   min(event_id) AS min_event_id,
                   max(event_id) AS max_event_id
            FROM events GROUP BY event_type, day ORDER BY event_type, day
        """,
        "running_totals": """
            SELECT user_id, event_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                   ) AS BIGINT) AS cum_value_cents
            FROM events
        """,
        "asof_join": """
            WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, ts, max(event_id) AS prior_event_id
                       FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
            SELECT p.user_id, p.event_id, c.prior_event_id
            FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "sample_docs": """
            SELECT doc_id FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 20
        """,
        "distinct_texts": """
            SELECT CAST(count(DISTINCT lower(text)) AS BIGINT) AS n_distinct FROM documents
        """,
    }
