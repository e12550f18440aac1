"""Training-data pipeline functions: text analysis, dedup, similarity,
multimodal plumbing. All hot paths are JVM-side built-ins or Arrow-batched
pandas UDFs — never per-row Python."""
