"""impresso_ta — a PySpark-native text-acquisition analytics engine.

A from-scratch re-expression of the capability surface of
impresso/impresso-text-acquisition (an OCR/ASR ETL pipeline built on Dask
bags) as an idiomatic Spark DataFrame engine, plus the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
required for large-scale corpus preparation.

Layout
------
- ``schemas``    fixed StructTypes for the canonical data model
                 (ref: importers/classes.py, rebuilders/helpers.py)
- ``sources``    discovery (detect) + canonical readers + partitioned sinks
- ``operators``  joins/filters/aggregations/windows + dedup/similarity/
                 text_analysis/multimodal extensions
- ``functions``  scalar column functions (ids, coords, iiif, whitespace)
- ``rebuild``    canonical → rebuilt ("solr") / passim document assembly
- ``importers``  format plugins (bytes → canonical rows) as mapInPandas UDTFs
"""

__version__ = "0.1.0"
