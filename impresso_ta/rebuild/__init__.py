"""Canonical → rebuilt ("solr") / passim document assembly."""

from impresso_ta.rebuild.solr import rebuild_issues_solr  # noqa: F401
from impresso_ta.rebuild.passim import rebuild_issues_passim  # noqa: F401
