"""Driver-contract sanity: entry() smoke + queries/oracle key alignment."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.limit(1000).collect()
    assert len(rows) > 0
    assert df.columns == ["url", "header", "combined", "transcribed",
                          "normalized", "n_blocks", "n_cols", "has_masthead"]


def test_every_oracle_key_has_a_query():
    qs = set(entrymod.queries().keys())
    os_ = set(entrymod.oracle_sql().keys())
    assert os_ <= qs, os_ - qs


def test_queries_run_and_oracle_parses(spark, sf_dir):
    """Each query must at least build a DataFrame plan; oracle SQL must
    parse in DuckDB (full value check lives in tools/validate_contract.py
    and the driver gate)."""
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        if name in oracles:
            cols = con.sql(oracles[name]).columns
            assert sorted(cols) == sorted(df.columns), \
                f"{name}: {sorted(cols)} vs {sorted(df.columns)}"
