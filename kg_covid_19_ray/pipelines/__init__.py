"""End-to-end pipelines: flagship KG construction, relational ops,
holdouts, text analysis, dedup suite, similarity search, multimodal."""
