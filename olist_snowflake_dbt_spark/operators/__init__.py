"""Engine operators: data-quality tests, incremental strategies, snapshots,
and the LLM-data-pipeline extensions (dedup, similarity, text, multimodal)."""
