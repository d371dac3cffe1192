"""Registry consistency checks (no Spark session needed — fast guards so a
broken query/oracle never reaches the driver's gate)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from storm_data_etl_spark.plans.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


def test_every_oracle_has_a_query():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs, f"oracle without query: {name}"


def test_runners_are_callable():
    for name, fn in entry.queries().items():
        assert callable(fn), name


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_oracle_sql_is_valid_duckdb(con):
    """EXPLAIN every oracle against the real views — catches SQL syntax or
    schema drift in milliseconds, without executing."""
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"oracle SQL for '{name}' invalid: {e}")


def test_registry_size_floor():
    """The operator inventory must not silently shrink (SURVEY §2 coverage)."""
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 153, f"query registry shrank: {len(qs)}"
    assert len(oracles) >= 145, f"oracle coverage shrank: {len(oracles)}"


def test_priority_head_never_gated_rotation():
    """Round-3 rotation contract: the gate head must consist of queries
    without prior CORRECTNESS_r*.json evidence (coverage converges), all
    oracle-backed, and approx_sketches must stay out of the head."""
    qs = list(entry.queries())
    head = qs[:50]
    assert "approx_sketches" not in head
    ng = set(entry.never_gated())
    # queries() may be imported before/after new CORRECTNESS records land;
    # only enforce when prior-round records exist (they do in this repo).
    if ng and len(ng) < len(qs):
        stale = [n for n in head if n not in ng]
        assert not stale, f"gate head wastes slots on already-proven queries: {stale}"


def test_priority_head_is_oracle_backed():
    """The driver's gate samples the head of queries(): every PRIORITY name
    must resolve, and the head must stay (almost) fully oracle-backed —
    rows-only entries there waste hash-proof slots."""
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = [n for n in entry.PRIORITY if n not in qs]
    assert not missing, f"PRIORITY names not in registry: {missing}"
    head = list(qs)[:50]
    rows_only = [n for n in head if n not in oracles]
    assert len(rows_only) <= 1, f"too many rows-only entries in head: {rows_only}"
