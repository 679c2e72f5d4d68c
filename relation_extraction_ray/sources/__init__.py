from .synth import corpus_table, gold_table, documents_dataset, gold_dataset, span_sequence_hash

__all__ = [
    "corpus_table",
    "gold_table",
    "documents_dataset",
    "gold_dataset",
    "span_sequence_hash",
]
