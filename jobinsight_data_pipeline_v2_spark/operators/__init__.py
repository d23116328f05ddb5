"""Relational operator library: SCD2 merge, set-based upsert/merge,
dedup families, similarity search, sessionization, multimodal plumbing."""
