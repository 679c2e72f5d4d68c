"""relation_extraction_ray — a from-scratch, Ray-Data-native knowledge-graph
construction engine with the data-processing capabilities of
teffland/Relation-Extraction (per-sentence relation extraction: parse →
noun-pair candidates → shortest-dependency-path featurization → encode →
relation scoring → triples → entity linking → canonicalization → graph
materialize), rebuilt as streaming ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches.

Layout:
  nlp/        deterministic tokenizer / POS / dependency parser (spaCy stand-in)
              + SDP extraction semantics shared by the Ray stages AND the
              pure-Python oracle (tests compare the two).
  sources/    readers/writers (Parquet; Lance adapter stub) + synthetic corpus.
  stages/     map_batches stages: parse, extract, encode, score, link, dedup,
              text analysis, similarity, multimodal plumbing.
  functions/  vocab build, broadcast joins, aggregate helpers.
  pipelines/  end-to-end KG pipeline + relational query library.
  state/      scorer weight fixtures, per-partition lineage/manifest.
"""

__version__ = "0.1.0"
