"""CLI surface: the reference's `python -m main` flag contract
(main.py:729-755) driven in-process (reuses the test session)."""

import json
import os


def _write_vocab(d):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "DISEASE__OPENTARGETS.json"), "w") as f:
        json.dump({"asthma": {"ids": ["EFO_0000270"], "pref_name": "asthma"}}, f)
    with open(os.path.join(d, "GENE__OPENTARGETS.json"), "w") as f:
        json.dump({"ADRA1D": {"ids": ["ENSG00000120907"], "pref_name": "ADRA1D"}}, f)


def test_cli_full_run_and_reentry(spark, tmp_path):
    from library_beam_spark.main import main
    from tests.conftest import RESOURCES

    vocab_dir = str(tmp_path / "vocab")
    _write_vocab(vocab_dir)
    med = os.path.join(RESOURCES, "medline")
    enriched_json = str(tmp_path / "enriched_json")
    tables = str(tmp_path / "tables")

    rc = main(
        [
            "--input_baseline", f"{med}/baseline/*.xml",
            "--input_updates", f"{med}/updates/*.xml.gz",
            "--vocab_dir", vocab_dir,
            "--enriched_json",
            "--output_enriched", enriched_json,
        ]
    )
    assert rc == 0

    rc = main(["--input_enriched", enriched_json, "--output_splitted", tables])
    assert rc == 0
    pubs = spark.read.parquet(f"{tables}/publication")
    assert {r["pub_id"] for r in pubs.select("pub_id").collect()} == {"101", "103", "104"}
    concepts = spark.read.parquet(f"{tables}/concepts")
    assert concepts.count() >= 3


def test_cli_vocab_loading(tmp_path):
    from library_beam_spark.vocab import load_vocabulary_dir

    vocab_dir = str(tmp_path / "v")
    _write_vocab(vocab_dir)
    vocab = load_vocabulary_dir(vocab_dir)
    assert vocab["asthma"][0]["category"] == "DISEASE"
    assert vocab["ADRA1D"][0]["ids"] == ["ENSG00000120907"]


def test_cli_arg_validation():
    from library_beam_spark.main import main

    assert main([]) == 2
    assert main(["--input_enriched", "/nope"]) == 2
