"""Vectorized Ray Data operators beyond the KG core: text analysis,
deduplication, similarity search, and relational demos over the generic
benchmark tables."""
