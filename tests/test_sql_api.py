"""The spark.sql surface over registered views."""

import pytest

from norsk_historisk_avis_ocr_spark.plans.sql_api import register_views


@pytest.fixture(scope="module")
def sql(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql


def test_sql_over_extraction_results(sql):
    row = sql("""
        SELECT count(*) AS n,
               sum(CASE WHEN header IS NOT NULL THEN 1 ELSE 0 END) AS with_head
        FROM extraction_results
    """).first()
    assert row.n == 500 and 0 < row.with_head < 500


def test_sql_sections_reading_order(sql):
    rows = sql("""
        SELECT url, collect_list(section) OVER (
                 PARTITION BY url ORDER BY ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS secs
        FROM extraction_sections
    """).limit(5).collect()
    for r in rows:
        if "header" in r.secs:
            assert r.secs[0] == "header"


def test_sql_islands_formulation(sql):
    rows = sql("""
        WITH r AS (
          SELECT user_id, event_type, event_id,
                 event_id - row_number() OVER (
                   PARTITION BY user_id, event_type ORDER BY event_id
                 ) AS island
          FROM events)
        SELECT count(*) AS n FROM (
          SELECT user_id, event_type, island FROM r
          GROUP BY user_id, event_type, island)
    """).first()
    assert rows.n > 0


def test_sql_join_pages_to_sections(sql):
    row = sql("""
        SELECT count(*) AS n
        FROM pages p JOIN extraction_sections s ON p.url = s.url
        WHERE s.section = 'header'
    """).first()
    assert row.n > 0
