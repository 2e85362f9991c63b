"""Replays the driver's correctness gate locally: every __spark_entry__
query vs its DuckDB oracle at sf0.001 (row count, column names,
order-insensitive value hash)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.check_oracle import TABLES, canon

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "main_text" in df.columns


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = con.execute(oracles[name]).df()
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    hs, rs = canon(sdf)
    ho, ro = canon(odf)
    assert hs == ho, (
        f"value mismatch; first diffs: "
        f"{[(a, b) for a, b in zip(rs, ro) if a != b][:3]}"
    )
