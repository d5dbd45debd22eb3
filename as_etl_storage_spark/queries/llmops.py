"""LLM-data-pipeline queries (dedup / similarity / text analysis /
multimodal) — filled by the operators modules."""

QUERIES: dict = {}
ORACLES: dict = {}
