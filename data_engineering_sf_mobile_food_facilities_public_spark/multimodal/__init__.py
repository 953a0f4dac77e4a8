"""Multimodal (binary-column) plumbing for the LLM-data pipeline
(BASELINE.json north star: "multimodal columns")."""
