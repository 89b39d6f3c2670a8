"""DataFrame→DataFrame operators beyond the reference surface: the
LLM-data-pipeline toolkit (dedup, similarity search, text analysis,
multimodal plumbing), each designed partition-parallel for 100 TB scale."""
