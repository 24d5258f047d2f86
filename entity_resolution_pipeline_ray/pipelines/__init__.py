"""End-user pipelines: entity resolution (flagship), dedup suite, similarity
search, text analysis, relational queries, multimodal plumbing."""
