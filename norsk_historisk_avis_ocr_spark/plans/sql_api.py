"""SQL surface: temp-view registration so every capability is reachable
from ``spark.sql`` — the engine is DataFrame-first, but a reference user
coming from a SQL workflow gets the same operators as views.

``register_views(spark, sf_dir)`` registers the raw tables plus derived
views (extraction results, exploded sections, signatures); pipeline outputs
are materialized views over the same operators the DataFrame API uses, so
SQL and DataFrame callers cannot diverge.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_views(spark: SparkSession, sf_dir: str,
                   with_pages: bool = True) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)
    if with_pages:
        from ..operators.extract import explode_sections, extract_pages
        from ..sources.pages import pages_df
        pages = pages_df(spark, sf_dir)
        pages.createOrReplaceTempView("pages")
        results = extract_pages(pages)
        results.createOrReplaceTempView("extraction_results")
        explode_sections(results).createOrReplaceTempView("extraction_sections")
