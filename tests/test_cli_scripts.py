"""spark-submit entrypoint scripts: build → query round trip in-process.

The scripts are argparse mains designed for spark-submit; here they run
in-process against a tiny corpus (getOrCreate picks up the test session).
"""

import json

import pytest


@pytest.fixture(scope="module")
def cli_env(spark, tiny_corpus_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("cli_wh"))
    return wh, f"{tiny_corpus_dir}/documents.parquet"


def test_build_then_query_roundtrip(spark, cli_env, capsys):
    wh, corpus = cli_env
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main

    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {s["stage"] for s in out["stages"]} == {
        "doc_features", "doc_meta", "corpus_stats", "postings", "term_stats"}
    assert not any(s["skipped"] for s in out["stages"])

    # resubmit: all stages skip (checkpoint resume via CLI)
    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(s["skipped"] for s in out["stages"])

    rc = query_main(["--warehouse", wh, "--k", "5",
                     "wireless bluetooth headphones", "absentterm9z"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    assert 1 <= len(lines[0]["results"]) <= 5  # tiny corpus: few matches
    assert lines[0]["results"][0]["score"] > 0
    assert lines[1]["results"] == []

    # filtered path goes through the full search envelope
    rc = query_main(["--warehouse", wh, "--k", "5", "--lang", "en",
                     "--count", "exact", "wireless bluetooth headphones"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["total_count"] >= len(env["results"]) > 0
    assert all("url" in r for r in env["results"])


def test_batch_query_cli_matches_per_query(spark, cli_env, capsys):
    """--batch answers all queries in one job with per-query envelopes
    identical to the per-query invocations."""
    wh, corpus = cli_env
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main

    build_main(["--input", corpus, "--warehouse", wh,
                "--shuffle-partitions", "4", "--doc-buckets", "4",
                "--term-buckets", "4", "--input-version", "v1"])
    capsys.readouterr()

    qs = ["wireless bluetooth headphones", "zipfhead0", "absentterm9z"]
    rc = query_main(["--warehouse", wh, "--k", "5", "--batch", *qs])
    assert rc == 0
    batch_lines = [json.loads(l) for l in
                   capsys.readouterr().out.strip().splitlines()]
    rc = query_main(["--warehouse", wh, "--k", "5", *qs])
    assert rc == 0
    single_lines = [json.loads(l) for l in
                    capsys.readouterr().out.strip().splitlines()]
    assert batch_lines == single_lines
    assert batch_lines[2]["results"] == []

    # --batch rejects filters
    rc = query_main(["--warehouse", wh, "--batch", "--lang", "en", "x"])
    assert rc == 2


def test_query_cli_round3_modes(spark, cli_env, capsys, tmp_path):
    """boolean/fuzzy/suggest/explain/facet/synonyms CLI surfaces."""
    wh, corpus = cli_env
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main

    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1",
                     "--fuzzy"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "term_deletes" in {s["stage"] for s in out["stages"]}

    # boolean mode
    rc = query_main(["--warehouse", wh, "--k", "5", "--mode", "boolean",
                     "zipfhead0 OR zipfhead1 -zipfhead2"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"] and env["results"][0]["score"] > 0

    # fuzzy mode corrects a typo'd term
    rc = query_main(["--warehouse", wh, "--k", "5", "--mode", "fuzzy",
                     "zipfhead0x"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["corrections"].get("zipfhead0x")
    assert env["results"]

    # suggest
    rc = query_main(["--warehouse", wh, "--k", "3", "--suggest", "zipf"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["suggestions"] and all(
        s["term"].startswith("zipf") for s in env["suggestions"])

    # explain for the top hit of a query
    rc = query_main(["--warehouse", wh, "--k", "1", "zipfhead0"])
    top = json.loads(capsys.readouterr().out.strip()
                     .splitlines()[-1])["results"][0]
    rc = query_main(["--warehouse", wh, "--explain", str(top["doc_id"]),
                     "zipfhead0"])
    assert rc == 0
    ex = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ex["total"] == top["score"]  # bit-identical replay

    # facet histogram (timeline granularity)
    rc = query_main(["--warehouse", wh, "--facet", "warc_ts:day",
                     "zipfhead0"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["counts"] and sum(c["n_docs"] for c in env["counts"]) > 0

    # synonyms expand retrieval (typo'd-absent term draws hits via synonym)
    syn_file = tmp_path / "syn.json"
    syn_file.write_text(json.dumps({"qqqabsent": ["zipfhead0"]}))
    rc = query_main(["--warehouse", wh, "--k", "5",
                     "--synonyms", f"@{syn_file}", "qqqabsent"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"]

    # filter/paging flags REFUSE (exit 2) on surfaces that would
    # otherwise silently drop them (review r3)
    assert query_main(["--warehouse", wh, "--mode", "boolean",
                       "--lang", "en", "x OR y"]) == 2
    assert query_main(["--warehouse", wh, "--mode", "fuzzy",
                       "--offset", "5", "x"]) == 2
    assert query_main(["--warehouse", wh, "--facet", "lang",
                       "--count", "exact", "x"]) == 2
    assert query_main(["--warehouse", wh, "--facet", "lang",
                       "--mode", "exhaustive", "x"]) == 2
    capsys.readouterr()


def test_query_cli_hybrid_prf_after(spark, cli_env, capsys):
    """--embeddings build flag + hybrid/prf modes + --after cursor paging."""
    wh, corpus = cli_env
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main

    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1",
                     "--embeddings", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "doc_embeddings" in {s["stage"] for s in out["stages"]}

    # hybrid mode carries per-path ranks for explainability
    rc = query_main(["--warehouse", wh, "--k", "5", "--mode", "hybrid",
                     "wireless bluetooth headphones"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"] and env["results"][0]["rrf_score"] > 0
    assert any(r["lex_rank"] is not None for r in env["results"])

    # prf mode reports its expansion terms
    rc = query_main(["--warehouse", wh, "--k", "5", "--mode", "prf",
                     "wireless bluetooth headphones"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"] and isinstance(env["expansion_terms"], list)

    # cursor chain: page 1 (no --after) then page 2 via next_cursor;
    # pages must not overlap
    rc = query_main(["--warehouse", wh, "--k", "3", "zipfhead0"])
    p1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # bare top-k path has no cursor; re-fetch page 1 through search_after
    rc = query_main(["--warehouse", wh, "--k", "3",
                     "--after", "1e18:0", "zipfhead0"])
    assert rc == 0
    p1b = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ([r["doc_id"] for r in p1b["results"]]
            == [r["doc_id"] for r in p1["results"]])
    s, d = p1b["next_cursor"]
    rc = query_main(["--warehouse", wh, "--k", "3",
                     "--after", f"{s}:{d}", "zipfhead0"])
    assert rc == 0
    p2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ids1 = {r["doc_id"] for r in p1b["results"]}
    assert p2["results"] and not ids1 & {r["doc_id"] for r in p2["results"]}

    # filtered hybrid/semantic route through the search() envelope (r4):
    # results hydrated with doc_meta columns and the lang filter applied
    rc = query_main(["--warehouse", wh, "--mode", "hybrid", "--lang",
                     "en", "--k", "3", "wireless bluetooth headphones"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"] and all(r["lang"] == "en"
                                  for r in env["results"])
    rc = query_main(["--warehouse", wh, "--mode", "semantic", "--k", "3",
                     "wireless bluetooth headphones"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"] and "score" in env["results"][0]

    # refusals: prf is bare top-k; vector modes take no --count;
    # --after excludes offset/count
    assert query_main(["--warehouse", wh, "--mode", "prf",
                       "--count", "exact", "x"]) == 2
    assert query_main(["--warehouse", wh, "--mode", "semantic",
                       "--count", "exact", "x"]) == 2
    assert query_main(["--warehouse", wh, "--after", "1.0:5",
                       "--offset", "3", "x"]) == 2
    capsys.readouterr()


def test_migrate_layout_cli(spark, cli_env, capsys):
    """migrate_layout.py rebuckets the committed index in place; queries
    through the stock CLI bind the new persisted config and still rank."""
    wh, corpus = cli_env
    from scripts.build_index import main as build_main
    from scripts.migrate_layout import main as migrate_main
    from scripts.query import main as query_main

    # ensure the index exists (module-scoped fixture order independence)
    build_main(["--input", corpus, "--warehouse", wh,
                "--shuffle-partitions", "4", "--doc-buckets", "4",
                "--term-buckets", "4", "--input-version", "v1"])
    capsys.readouterr()

    rc = migrate_main(["--warehouse", wh, "--doc-buckets", "3",
                       "--term-buckets", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok"
    assert out["changed"] == {"n_doc_buckets": [4, 3],
                              "n_term_buckets": [4, 2]}

    rc = query_main(["--warehouse", wh, "--k", "5",
                     "wireless bluetooth headphones"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["results"] and res["results"][0]["score"] > 0

    # no overrides → explicit noop, not an accidental rebuild
    rc = migrate_main(["--warehouse", wh])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "noop"


def test_champions_cli_build_and_impact_mode(spark, cli_env, capsys):
    """--champions builds the impact-ordered side table; --mode impact
    answers approximate top-k from it; filter flags are refused."""
    wh, corpus = cli_env
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main

    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1",
                     "--champions"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "champions" in {s["stage"] for s in out["stages"]}

    rc = query_main(["--warehouse", wh, "--k", "5", "--mode", "impact",
                     "zipfhead0 zipfhead1"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["approximate"] is True
    assert len(env["results"]) == 5
    assert env["results"][0]["score"] > 0

    # impact is a bare-top-k surface: filters refused loudly
    rc = query_main(["--warehouse", wh, "--k", "5", "--mode", "impact",
                     "--lang", "en", "zipfhead0"])
    assert rc == 2


def test_link_field_and_static_rank_cli(spark, tmp_path_factory, capsys):
    """--link-field/--static-rank build the anchor index and PageRank
    table; --weights and --static pagerank query them; the two ranking
    flags refuse filters and each other."""
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main
    from tests.test_anchor_field import _rows

    wh = str(tmp_path_factory.mktemp("cli_link_wh"))
    corpus = str(tmp_path_factory.mktemp("cli_link_corpus")) + "/docs.parquet"
    spark.createDataFrame(
        _rows(), "url string, warc_ts timestamp, html binary, "
                 "text string, lang string").write.parquet(corpus)

    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1",
                     "--link-field", "--static-rank"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    stages = {s["stage"] for s in out["stages"]}
    assert {"links", "doc_features_anchor", "postings_anchor",
            "static_rank"} <= stages

    # anchor-only term resolves through the anchor field index
    rc = query_main(["--warehouse", wh, "--k", "5", "--weights",
                     '{"anchor": 1.0}', "quantumflux"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"] and env["field_weights"] == {"anchor": 1.0}

    rc = query_main(["--warehouse", wh, "--k", "5", "--static",
                     "pagerank", "--w-static", "10", "shared common"])
    assert rc == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["results"] and env["static"] == "pagerank"

    # bare-top-k surfaces: filters and flag combinations refused loudly
    rc = query_main(["--warehouse", wh, "--static", "pagerank",
                     "--lang", "en", "shared"])
    assert rc == 2
    rc = query_main(["--warehouse", wh, "--static", "pagerank",
                     "--weights", '{"text": 1.0}', "shared"])
    assert rc == 2


def test_query_cli_boost_and_rescore(spark, cli_env, capsys):
    """--boost parses term^N syntax; --rescore reranks the WAND window
    by embedding cosine (embeddings from the earlier --embeddings
    build); both refuse filter composition."""
    wh, corpus = cli_env
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main

    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1",
                     "--embeddings", "32"])
    assert rc == 0
    capsys.readouterr()

    rc = query_main(["--warehouse", wh, "--k", "5", "--boost",
                     "zipfhead0 zipfhead1^50"])
    assert rc == 0
    boosted = json.loads(capsys.readouterr().out.strip())
    assert boosted["boost"] is True and boosted["results"]

    rc = query_main(["--warehouse", wh, "--k", "5",
                     "zipfhead0 zipfhead1"])
    assert rc == 0
    plain = json.loads(capsys.readouterr().out.strip())
    assert ([r["doc_id"] for r in boosted["results"]]
            != [r["doc_id"] for r in plain["results"]])

    rc = query_main(["--warehouse", wh, "--k", "5",
                     "--rescore", "50:1.0:2.0", "zipfhead0"])
    assert rc == 0
    resc = json.loads(capsys.readouterr().out.strip())
    assert resc["rescore"] == "50:1.0:2.0" and len(resc["results"]) == 5

    # refusals: filters and mode combinations
    rc = query_main(["--warehouse", wh, "--boost", "--lang", "en", "q"])
    assert rc == 2
    rc = query_main(["--warehouse", wh, "--boost",
                     "--rescore", "10", "q"])
    assert rc == 2


def test_query_cli_rerank(spark, cli_env, capsys):
    """--rerank rescores the WAND window with the deterministic fake
    cross-scorer and matches the programmatic API bit-for-bit; refuses
    composition with filters and other ranking modes."""
    wh, corpus = cli_env
    from scripts.build_index import main as build_main
    from scripts.query import main as query_main

    rc = build_main(["--input", corpus, "--warehouse", wh,
                     "--shuffle-partitions", "4", "--doc-buckets", "4",
                     "--term-buckets", "4", "--input-version", "v1"])
    assert rc == 0
    capsys.readouterr()

    rc = query_main(["--warehouse", wh, "--k", "5", "--rerank", "30",
                     "zipfhead0 zipfhead1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rerank"] == 30 and len(out["results"]) == 5
    # descending by rerank_score, and bit-identical to the API
    rs = [r["rerank_score"] for r in out["results"]]
    assert rs == sorted(rs, reverse=True)

    from semantic_search_engine_spark.operators.rerank import (
        deterministic_fake_cross_scorer,
    )
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    # cfg=None binds to the persisted build config (4-bucket layout)
    qe = QueryEngine(spark, HadoopTableStore(spark, wh), None)
    api = qe.rerank_top_k("zipfhead0 zipfhead1", k=5, first_k=30,
                          scorer=deterministic_fake_cross_scorer())
    assert [(r["doc_id"], r["rerank_score"], r["score"])
            for r in out["results"]] == api

    rc = query_main(["--warehouse", wh, "--rerank", "30",
                     "--lang", "en", "q"])
    assert rc == 2
    rc = query_main(["--warehouse", wh, "--rerank", "30",
                     "--boost", "q"])
    assert rc == 2
