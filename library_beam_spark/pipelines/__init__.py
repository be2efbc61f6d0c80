"""Pipeline assemblies (SURVEY §3.1): enrich / split / load.

The reference's conditional Beam DAG (main.py:757-812) becomes three
plain functions over DataFrames:

    run_enrich(spark, baseline, updates)  -> enriched publications
    run_split(enriched)                   -> 4 output DataFrames
    run_load(outputs, base_path)          -> partitioned Parquet tables
"""

from .enrich import run_enrich  # noqa: F401
from .split import run_split  # noqa: F401
from .load import run_load  # noqa: F401
