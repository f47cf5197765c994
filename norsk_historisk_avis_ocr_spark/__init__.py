"""PySpark-native main-content extraction engine.

A from-scratch re-expression of the extraction semantics of
``agjendem/norsk-historisk-avis-ocr`` (reference, read-only at
``/root/reference/``) as a batch PySpark pipeline over Common-Crawl-style
web-page tables ``(url, warc_ts, html, text, lang)``:

- layout segmentation (band-divider / gap-coverage / XY-cut geometry and a
  DOM/text-density HTML analog),
- reading-order reconstruction,
- boilerplate / masthead stripping,
- divider-noise cleaning and reflow with **byte-identical** semantics to the
  reference's pure text functions,
- trie-based historical-Norwegian orthography normalization (deterministic
  analog of the reference's LLM correction pass),
- plus the large-scale training-data operators a 100 TB corpus needs
  (dedup, similarity search, language-ID, quality scoring).

Layout:

- :mod:`~norsk_historisk_avis_ocr_spark.stages` — pure Python/numpy stage
  library (the byte contract; testable without Spark).
- :mod:`~norsk_historisk_avis_ocr_spark.functions` — vectorized pandas UDFs
  wrapping the stages.
- :mod:`~norsk_historisk_avis_ocr_spark.operators` — DataFrame-level
  operators (extraction pipeline, dedup, similarity, windows, resume).
- :mod:`~norsk_historisk_avis_ocr_spark.sources` — synthetic pages
  generator, readers, sinks.
- :mod:`~norsk_historisk_avis_ocr_spark.plans` — SparkSession builders with
  scale-tuned configs.
"""

__version__ = "0.1.0"
