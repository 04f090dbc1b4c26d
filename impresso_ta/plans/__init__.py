"""Composed pipeline plans (synthetic corpus builders, bench pipelines)."""

from impresso_ta.plans.synthetic import synthetic_canonical_corpus  # noqa: F401
