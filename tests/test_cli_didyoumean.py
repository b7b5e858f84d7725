"""CLI surfaces for the persisted-LM phrase suggester (X74):
build_index --lm, query --did-you-mean, and the site:-operator
extraction through the query CLI (X68)."""
import json

import pytest


@pytest.fixture(scope="module")
def cli_wh(spark, tiny_corpus_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("cli_wh_dym"))
    return wh, f"{tiny_corpus_dir}/documents.parquet"


def test_build_lm_and_did_you_mean_cli(spark, cli_wh, capsys):
    wh, corpus = cli_wh
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main

    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1",
                     "--fuzzy", "--lm"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    stages = {s["stage"] for s in out["stages"]}
    assert {"lm_unigrams", "lm_bigrams", "term_deletes"} <= stages

    rc = query_main(["--warehouse", wh, "--k", "3", "--did-you-mean",
                     "zipfhead0 zipfheed1"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["suggestions"][0]["suggestion"] == "zipfhead0 zipfhead1"
    assert env["suggestions"][0]["changed"]


def test_site_operator_via_query_cli(spark, cli_wh, capsys):
    wh, corpus = cli_wh
    from scripts.query import main as query_main

    rc = query_main(["--warehouse", wh, "--k", "5",
                     "zipfhead0 zipfhead1 site:site0001.example"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"]
    assert all("site0001.example" in r["url"] for r in env["results"])
    # the original query string (with the operator) echoes back
    assert "site:" in env["query"]
