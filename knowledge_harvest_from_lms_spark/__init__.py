"""knowledge_harvest_from_lms_spark — a from-scratch, PySpark-native
knowledge-graph construction engine with the query and data-processing
capabilities of BertNet (tanyuqian/knowledge-harvest-from-lms,
"Harvesting Knowledge Graphs from Pretrained Language Models",
arXiv:2206.14268), re-targeted at Common-Crawl-style web-page tables.

Layout
------
- ``functions/`` : pure scalar kernels (slot math, filters, score
  combiners) + Spark ``Column`` expression builders. Parity-critical —
  unit-tested against reference semantics with `file:line` citations.
- ``lm/``        : masked-LM abstraction. ``StubMLM`` is a seeded,
  deterministic stand-in (no torch in this sandbox); ``hf.py`` is the
  import-gated HuggingFace backend for real clusters.
- ``sources/``   : relation-info dim table, synthetic ``web_pages``
  generator, testdata loaders, Iceberg-or-parquet catalog shim.
- ``operators/`` : the dataflow operators of SURVEY.md §2 — prompt
  weighting, iterative-DataFrame-join beam search, re-scoring,
  canonicalization (MinHash-LSH + salted groupBy), graph materialize,
  dedup family, similarity search, text stats, checkpoint/resume.
- ``plans/``     : driver-side orchestration (the harvest pipeline).
- ``streaming/`` : optional WARC->web_pages ingest (reference is pure
  batch; see SURVEY.md §2.9).
"""

__version__ = "0.1.0"
