"""Replicates the driver's correctness gate locally: every REGISTRY entry's
Spark result must match its DuckDB oracle at sf0.01 (row count, column
names, values as an order-insensitive multiset; floats to 1e-6)."""

import math

import duckdb
import pytest

from semantic_search_engine_spark.driver_contract import REGISTRY

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def canon(df):
    """pandas → sorted list of canonicalized tuples, sorted column order."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return cols, sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_registry_fits_driver_verification_window():
    """The driver verifies at most DRIVER_VERIFY_WINDOW registry entries;
    anything past the window silently gets no CORRECTNESS row (VERDICT r2
    #1: four r2 entries fell outside it). This guard makes the scoreboard
    cover 100% of the exposed surface, permanently."""
    from semantic_search_engine_spark.driver_contract import (
        DRIVER_VERIFY_WINDOW,
    )

    assert len(REGISTRY) <= DRIVER_VERIFY_WINDOW
    # every entry must also carry an oracle (no weaker rows-only checks)
    assert all(sql is not None for _fn, sql in REGISTRY.values())


def _compare(name, fn, sql, spark, ddb):
    got_cols, got = canon(fn(spark, SF_DIR).toPandas())
    exp_cols, exp = canon(ddb.execute(sql).df())
    assert got_cols == exp_cols, f"{name}: columns differ"
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    mismatches = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{got[mismatches[0]]} != {exp[mismatches[0]]}")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, ddb):
    fn, sql = REGISTRY[name]
    _compare(name, fn, sql, spark, ddb)


def _retired_pins():
    """Pairs swapped OUT of the 50-entry registry (r3: simhash signatures
    and shingle stats — both exercised transitively by the surviving
    pair entries; late r3: having_filter/exists_subquery folded into
    having_exists and token_counts into text_quality_metrics) stay
    pinned here so the capability never regresses."""
    from semantic_search_engine_spark.driver_contract import (
        SQL_AGG_PUSHDOWN,
        SQL_EXISTS_SUBQUERY,
        SQL_HAVING,
        SQL_SHINGLE3,
        SQL_SIMHASH,
        SQL_TOPK,
        _sql_token_counts,
        q_agg_pushdown,
        q_exists_subquery,
        q_having_filter,
        q_shingle3_stats,
        q_simhash,
        q_token_counts,
        q_topk_orderby_limit,
    )

    return {"simhash": (q_simhash, SQL_SIMHASH),
            "shingle3_stats": (q_shingle3_stats, SQL_SHINGLE3),
            "having_filter": (q_having_filter, SQL_HAVING),
            "exists_subquery": (q_exists_subquery, SQL_EXISTS_SUBQUERY),
            "token_counts": (q_token_counts, _sql_token_counts()),
            # r4: retired to admit the MaxScore engine gate (subsumed by
            # pagination_offset's ranking over the same ORDER BY)
            "topk_orderby_limit": (q_topk_orderby_limit, SQL_TOPK),
            # r5: retired to admit the persisted-IVF serve gate
            # (aggregate shape covered by rollup_set_ops +
            # join_agg_broadcast — VERDICT r4 #2)
            "agg_pushdown": (q_agg_pushdown, SQL_AGG_PUSHDOWN)}


@pytest.mark.parametrize("name", sorted(_retired_pins()))
def test_retired_pair_matches_oracle(name, spark, ddb):
    fn, sql = _retired_pins()[name]
    _compare(name, fn, sql, spark, ddb)
