"""Composed pipeline plans (synthetic corpus builders, bench pipelines)."""

from impresso_ta.plans.synthetic import (  # noqa: F401
    synthetic_audio_corpus,
    synthetic_canonical_corpus,
)
