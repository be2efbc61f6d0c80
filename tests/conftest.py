import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = "/root/testdata"
SF_SMALL = f"{TESTDATA}/sf0.001"
RESOURCES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "resources")


@pytest.fixture(scope="session")
def spark():
    from library_beam_spark.session import get_spark

    spark = get_spark("tests", master="local[4]")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield spark


@pytest.fixture(scope="session")
def vocab():
    return {
        "asthma": [
            {"category": "DISEASE", "reference_db": "OPENTARGETS",
             "ids": ["EFO_0000270"], "pref_name": "asthma"}
        ],
        "airway inflammation": [
            {"category": "PHENOTYPE", "reference_db": "HPO",
             "ids": ["HP_0006536"], "pref_name": "airway inflammation"}
        ],
        "inflammation": [
            {"category": "PHENOTYPE", "reference_db": "HPO",
             "ids": ["HP_0012649"], "pref_name": "inflammation"}
        ],
        "ADRA1D": [
            {"category": "GENE", "reference_db": "OPENTARGETS",
             "ids": ["ENSG00000120907"], "pref_name": "ADRA1D"}
        ],
        "TNF": [
            {"category": "GENE", "reference_db": "OPENTARGETS",
             "ids": ["ENSG00000232810"], "pref_name": "TNF"}
        ],
        "apoptosis": [
            {"category": "PROCESS", "reference_db": "GO",
             "ids": ["GO_0006915"], "pref_name": "apoptosis"}
        ],
        "TTF-1": [
            {"category": "GENE", "reference_db": "OPENTARGETS",
             "ids": ["ENSG00000136352"], "pref_name": "NKX2-1"}
        ],
    }
