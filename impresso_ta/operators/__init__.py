"""Dataflow operators: relational helpers + LLM-data-pipeline extensions."""
