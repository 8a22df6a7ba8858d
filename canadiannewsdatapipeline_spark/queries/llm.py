"""LLM-data-pipeline extension corpus — populated next (dedup/similarity/text)."""
