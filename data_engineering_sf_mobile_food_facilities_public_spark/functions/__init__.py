"""Scalar function library (reference F1-F7, SURVEY.md section 2.8) plus
the text-analysis / vector functions for the LLM-data-pipeline extensions."""
