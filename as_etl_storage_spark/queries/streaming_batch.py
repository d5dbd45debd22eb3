"""Batch analogs of the streaming surface (windowed aggregation, watermark
dedup) — filled by the streaming module."""

QUERIES: dict = {}
ORACLES: dict = {}
