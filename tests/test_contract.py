"""Driver-contract meta-guards: every oracle parses, and its output
column names match the Spark query's schema EXACTLY.

The correctness gate hashes values after sorting columns BY NAME, so an
alias drifting on either side ('sum_qty' vs 'sum(l_quantity)') fails
the hash even when values agree — historically the easiest way to break
a green query. DuckDB side is DESCRIBE over views on the smallest
testdata (no rows scanned). The Spark side is schema resolution for
most queries; the handful of iterative builders (pagerank, BPE, IVF,
clustering) genuinely execute at construction, so this runs in about a
minute at sf0.001 — still an order of magnitude under the value gate.
"""

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def test_every_oracle_parses_and_columns_match(spark, duck):
    from library_beam_spark import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    # oracle keys must be a subset of query keys
    assert set(oracles) <= set(qs)

    mismatches = []
    for name, sql in sorted(oracles.items()):
        oracle_cols = [
            r[0] for r in duck.execute(f"DESCRIBE {sql}").fetchall()
        ]
        spark_cols = qs[name](spark, SF).columns  # analysis only
        if sorted(oracle_cols) != sorted(spark_cols):
            mismatches.append((name, sorted(spark_cols), sorted(oracle_cols)))
    assert not mismatches, mismatches


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must be a registered query — a
    typo here would crash the driver's per-round bench run."""
    import importlib.util
    import os

    from library_beam_spark import registry

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    names = set(registry.queries())
    missing = [q for q in bench.HEADLINE if q not in names]
    assert not missing, missing
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
