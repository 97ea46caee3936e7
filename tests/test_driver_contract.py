"""Local replica of the driver's correctness gate (__spark_entry__.py):
every queries() entry matches its oracle_sql() DuckDB twin at sf0.001
(the driver itself runs sf0.01 — scripts/check_contract.py covers that
manually)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"url", "extracted_text", "n_blocks"}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_all_queries_match_duckdb_oracle(spark):
    from scripts.check_contract import run_check

    prev = os.environ.get("SPARK_GRAFT_ORACLE_SF")
    assert run_check(spark, SF_DIR) == 0
    # the gate's sf-dir override must not leak into later oracle_sql()
    # callers in this process (r5 review)
    assert os.environ.get("SPARK_GRAFT_ORACLE_SF") == prev


def test_oracle_sql_builds_without_oracle_dir(monkeypatch):
    """A missing oracle dir degrades ONLY the data-derived IVF twin (to a
    SQL that errors clearly if executed) — every sf-independent twin
    still builds, so callers that never touch the IVF entry work on a
    checkout without testdata (r5 review)."""
    import __spark_entry__ as mod

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF", "/nonexistent/sfX")
    sql = mod.oracle_sql()
    assert "error(" in sql["ann_ivf_topk"]
    assert "centroids unavailable" in sql["ann_ivf_topk"]
    assert "SELECT" in sql["doc_repetition"]  # sf-independent twins intact


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_oracle_coverage(spark):
    """Every query has an oracle twin except the explicitly non-SQL ones."""
    import __spark_entry__ as mod

    qs, oracles = set(mod.queries()), set(mod.oracle_sql())
    assert oracles <= qs
    rows_only = qs - oracles
    assert rows_only == set()  # every query has a DuckDB twin (r02)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_contract_green_under_foreign_session_timezone(spark):
    """The driver's session may not pin UTC: every query must stay
    hash-green under Asia/Tokyo (timestamp literals are used consistently
    within each query and no comparable schema carries a raw timestamp;
    user_sessions save/restores the TZ itself)."""
    from scripts.check_contract import run_check

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        assert run_check(spark, SF_DIR) == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
