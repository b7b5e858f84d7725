"""spark-submit entrypoint: run BM25 top-k queries against a built index.

Usage:

    spark-submit --py-files sse_spark.zip scripts/query.py \
        --warehouse <path-or-catalog> [--store hadoop|iceberg] \
        [--field text|title] [--k 10] [--offset 0] [--min-score 0] \
        [--lang en] [--mode wand|exhaustive|boolean|fuzzy|hybrid|semantic] \
        [--count exact|approx|none] [--synonyms JSON|@file] \
        [--facet COL[:GRANULARITY]] [--suggest] [--explain DOC_ID] \
        [--rerank FIRST_K] \
        [--log-dir <query-log dir>] "query text" ["another query" ...]

Prints one JSON line per query: the result envelope (results, total_count,
limit, offset, query, execution_time_ms) — the SearchResponse analogue.
``site:host`` / ``-site:host`` operators inside a wand/exhaustive query
become structured host filters (subdomain-inclusive), like every web
search box.
--suggest/--explain/--facet switch the output to typeahead suggestions,
a per-term BM25 breakdown, or a facet histogram respectively.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--store", default="hadoop", choices=["hadoop", "iceberg"])
    p.add_argument("--field", default="text",
                   choices=["text", "title", "anchor"])
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--min-score", type=float, default=0.0)
    p.add_argument("--lang", default=None)
    p.add_argument("--mode", default="wand",
                   choices=["wand", "exhaustive", "boolean", "fuzzy",
                            "hybrid", "semantic", "prf", "impact"],
                   help="boolean = websearch syntax (AND/OR/-/\"phrase\"/"
                        "word*); fuzzy = typo-tolerant (needs the --fuzzy "
                        "build); hybrid = BM25 ⊕ embedding-cosine RRF, "
                        "semantic = pure embedding-cosine (both need the "
                        "--embeddings build; IVF-accelerated when "
                        "build_ann ran, and both take --lang/--offset/"
                        "--min-score); prf = pseudo-relevance-feedback "
                        "expansion")
    p.add_argument("--count", default="none",
                   choices=["exact", "approx", "none"])
    p.add_argument("--synonyms", default=None, metavar="JSON",
                   help="ts_rewrite map {\"term\": [\"syn\", ...]} or "
                        "@file.json; expands wand and boolean queries")
    p.add_argument("--facet", default=None, metavar="COL[:GRANULARITY]",
                   help="print the match set's facet histogram instead of "
                        "hits (GRANULARITY = year/month/day/... for "
                        "timestamp columns)")
    p.add_argument("--suggest", action="store_true",
                   help="positional args are prefixes; print typeahead "
                        "suggestions")
    p.add_argument("--did-you-mean", action="store_true",
                   help="print full-query spelling corrections (needs "
                        "the --fuzzy and --lm builds)")
    p.add_argument("--explain", type=int, default=None, metavar="DOC_ID",
                   help="print the per-term BM25 breakdown of "
                        "(query, DOC_ID)")
    p.add_argument("--batch", action="store_true",
                   help="answer ALL queries in one Spark job "
                        "(multi-query WAND; bare top-k only — "
                        "incompatible with filters/offset/count)")
    p.add_argument("--after", default=None, metavar="SCORE:DOC_ID",
                   help="keyset-pagination cursor — the previous page's "
                        "next_cursor; pages cost O(k) at any depth "
                        "(incompatible with --offset and --count)")
    p.add_argument("--static", default=None, metavar="PRIOR",
                   help="blend a static document prior into the score "
                        "(bm25 + W*prior): a doc_meta column, the builtin "
                        "'url_prior', or 'pagerank' (needs the "
                        "--static-rank build)")
    p.add_argument("--w-static", type=float, default=1.0,
                   help="weight W for --static (default 1.0)")
    p.add_argument("--rescore", default=None, metavar="WINDOW[:QW:RW]",
                   help="ES rescore API: re-rank the BM25 top-WINDOW by "
                        "QW*bm25 + RW*cosine (needs --embeddings at "
                        "build); bare top-k surface")
    p.add_argument("--boost", action="store_true",
                   help="parse term^N per-term boosts in the query "
                        "(Lucene query_string syntax); bare WAND top-k")
    p.add_argument("--weights", default=None, metavar="JSON",
                   help="BM25F multi-field weights, e.g. "
                        "'{\"text\": 1.0, \"anchor\": 2.0}' — each field "
                        "needs its own built index")
    p.add_argument("--rerank", type=int, default=None, metavar="FIRST_K",
                   help="cross-encoder rerank of the WAND top-FIRST_K "
                        "window (X116) using the deterministic fake "
                        "scorer — a demo surface; real models are "
                        "injected via QueryEngine.rerank_top_k(loader=); "
                        "bare WAND top-k")
    p.add_argument("--log-dir", default=None)
    p.add_argument("queries", nargs="+")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None

    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import make_store

    spark = (SparkSession.builder.appName("sse-query")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    store = make_store(spark, args.warehouse, args.store)
    # cfg=None → bind to the config persisted by the index build
    qe = QueryEngine(spark, store, cfg=None, field=args.field,
                     query_log_dir=args.log_dir)

    synonyms = None
    if args.synonyms:
        from semantic_search_engine_spark.operators.synonyms import (
            normalize_synonyms,
        )
        raw = args.synonyms
        if raw.startswith("@"):
            with open(raw[1:]) as f:
                raw = f.read()
        # canonicalize through the INDEX's analyzer (persisted config), so
        # synonym entries land in indexed-term form on an english index
        synonyms = normalize_synonyms(json.loads(raw),
                                      qe.cfg.max_token_len,
                                      qe.cfg.min_token_len,
                                      qe.cfg.analyzer)

    # surfaces that answer over the FULL match set (or a bare top-k)
    # must refuse filter/paging flags rather than silently drop them
    filters_set = (args.lang is not None or args.min_score != 0.0
                   or args.offset != 0 or args.count != "none")
    if args.rerank is not None and (
            args.after is not None or args.suggest or args.did_you_mean
            or args.explain is not None or args.facet is not None):
        # those surfaces dispatch before the --rerank block below would
        # run; refuse rather than silently return un-reranked output
        print("--rerank composes with none of --after/--suggest/"
              "--did-you-mean/--explain/--facet", file=sys.stderr)
        return 2
    if args.after is not None:
        if args.offset != 0 or args.count != "none" or args.mode != "wand":
            print("--after is cursor paging on the WAND fast path "
                  "(no --offset/--count/other modes)", file=sys.stderr)
            return 2
        s, _, d = args.after.partition(":")
        cursor = (float(s), int(d))
        for q in args.queries:
            print(json.dumps(qe.search_after(
                q, k=args.k, cursor=cursor, min_score=args.min_score,
                lang=args.lang), default=str))
        if not preexisting:
            spark.stop()
        return 0

    if args.mode == "prf" and (filters_set or synonyms):
        print("--mode prf supports bare top-k only "
              "(no --lang/--min-score/--offset/--count/--synonyms)",
              file=sys.stderr)
        return 2

    if args.mode in ("hybrid", "semantic") and (args.count != "none"
                                                or synonyms):
        # vector modes serve the search() envelope with count_mode="none"
        # semantics: an exact pre-limit count over a vector ranking would
        # be a corpus-wide threshold scan (see QueryEngine.search)
        print(f"--mode {args.mode} takes --lang/--offset/--min-score but "
              "not --count/--synonyms", file=sys.stderr)
        return 2

    if args.mode == "impact" and filters_set:
        print("--mode impact is approximate champion-list retrieval "
              "(bare top-k only; build with --champions first)",
              file=sys.stderr)
        return 2

    if args.mode in ("boolean", "fuzzy") and filters_set:
        print(f"--mode {args.mode} supports bare top-k only "
              "(no --lang/--min-score/--offset/--count)", file=sys.stderr)
        return 2
    if args.facet is not None:
        if filters_set:
            print("--facet histograms the full match set "
                  "(no --lang/--min-score/--offset/--count)",
                  file=sys.stderr)
            return 2
        if args.mode not in ("wand", "boolean"):
            print("--facet supports --mode wand (disjunctive match set) "
                  "or boolean only", file=sys.stderr)
            return 2

    if args.suggest:
        for prefix in args.queries:
            print(json.dumps({"prefix": prefix, "suggestions": [
                {"term": t, "df": df}
                for t, df in qe.suggest(prefix, n=args.k)]}))
        if not preexisting:
            spark.stop()
        return 0

    if args.did_you_mean:
        from semantic_search_engine_spark.operators.lm import load_lm
        from semantic_search_engine_spark.operators.suggest_phrase import (
            suggest_phrase,
        )
        lm = load_lm(store, field=args.field)
        sfx = "" if args.field == "text" else f"_{args.field}"
        deletes = store.read(f"term_deletes{sfx}")
        for q in args.queries:
            out = suggest_phrase(
                q, deletes, lm, n_best=args.k,
                max_token_len=qe.cfg.max_token_len,
                min_token_len=qe.cfg.min_token_len,
                analyzer=qe.cfg.analyzer,
                n_term_buckets=qe.cfg.n_term_buckets)
            print(json.dumps({"query": q, "suggestions": out}))
        if not preexisting:
            spark.stop()
        return 0

    if args.explain is not None:
        for q in args.queries:
            print(json.dumps(qe.explain_score(q, args.explain),
                             default=str))
        if not preexisting:
            spark.stop()
        return 0

    if args.facet is not None:
        by, _, gran = args.facet.partition(":")
        mode = "boolean" if args.mode == "boolean" else "any"
        for q in args.queries:
            rows = qe.facet_counts(q, by=by, mode=mode,
                                   granularity=gran or None).collect()
            print(json.dumps({"query": q, "facet": args.facet,
                              "counts": [{by: r[by],
                                          "n_docs": int(r["n_docs"])}
                                         for r in rows]}, default=str))
        if not preexisting:
            spark.stop()
        return 0

    if args.rerank is not None:
        if (filters_set or synonyms or args.mode != "wand" or args.batch
                or args.rescore is not None or args.boost
                or args.static is not None or args.weights is not None):
            print("--rerank is a bare WAND top-k surface (no filters/"
                  "offset/count/synonyms/batch/other ranking modes)",
                  file=sys.stderr)
            return 2
        from semantic_search_engine_spark.operators.rerank import (
            deterministic_fake_cross_scorer,
        )

        fake = deterministic_fake_cross_scorer()
        for q in args.queries:
            hits = qe.rerank_top_k(q, k=args.k, first_k=args.rerank,
                                   scorer=fake)
            print(json.dumps(
                {"results": [{"doc_id": d, "rerank_score": rs,
                              "score": s} for d, rs, s in hits],
                 "total_count": len(hits), "limit": args.k, "offset": 0,
                 "query": q, "rerank": args.rerank}, default=str))
        if not preexisting:
            spark.stop()
        return 0

    if args.rescore is not None or args.boost:
        if filters_set or synonyms or args.mode != "wand" or args.batch:
            print("--rescore/--boost are bare WAND top-k surfaces "
                  "(no filters/offset/count/synonyms/batch)",
                  file=sys.stderr)
            return 2
        if args.rescore is not None and args.boost:
            print("--rescore and --boost are separate ranking modes; "
                  "pass one", file=sys.stderr)
            return 2
        for q in args.queries:
            if args.boost:
                hits = qe.term_boosted_top_k(q, k=args.k)
                out = {"results": [{"doc_id": d, "score": s}
                                   for d, s in hits],
                       "total_count": len(hits), "limit": args.k,
                       "offset": 0, "query": q, "boost": True}
            else:
                parts = args.rescore.split(":")
                window = int(parts[0])
                qw = float(parts[1]) if len(parts) > 1 else 1.0
                rw = float(parts[2]) if len(parts) > 2 else 1.0
                hits = qe.rescore_top_k(q, k=args.k, window=window,
                                        query_weight=qw,
                                        rescore_weight=rw)
                out = {"results": [{"doc_id": d, "score": s}
                                   for d, s in hits],
                       "total_count": len(hits), "limit": args.k,
                       "offset": 0, "query": q, "rescore": args.rescore}
            print(json.dumps(out, default=str))
        if not preexisting:
            spark.stop()
        return 0

    if args.static is not None or args.weights is not None:
        if filters_set or synonyms or args.mode != "wand" or args.batch:
            print("--static/--weights are bare WAND top-k surfaces "
                  "(no filters/offset/count/synonyms/batch)",
                  file=sys.stderr)
            return 2
        if args.static is not None and args.weights is not None:
            print("--static and --weights are separate ranking modes; "
                  "pass one", file=sys.stderr)
            return 2
        for q in args.queries:
            if args.weights is not None:
                hits = qe.weighted_top_k(q, json.loads(args.weights),
                                         k=args.k)
                out = {"results": [{"doc_id": d, "score": s}
                                   for d, s in hits],
                       "total_count": len(hits), "limit": args.k,
                       "offset": 0, "query": q,
                       "field_weights": json.loads(args.weights)}
            else:
                hits = qe.boosted_top_k(q, static=args.static,
                                        w_static=args.w_static, k=args.k)
                out = {"results": [{"doc_id": d, "score": s}
                                   for d, s in hits],
                       "total_count": len(hits), "limit": args.k,
                       "offset": 0, "query": q, "static": args.static,
                       "w_static": args.w_static}
            print(json.dumps(out, default=str))
        if not preexisting:
            spark.stop()
        return 0

    if args.batch:
        if (args.lang is not None or args.min_score != 0.0
                or args.offset != 0 or args.count != "none"
                or args.mode != "wand" or synonyms):
            print("--batch supports bare WAND top-k only "
                  "(no filters/offset/count/exhaustive)", file=sys.stderr)
            return 2
        results = qe.batch_top_k(args.queries, k=args.k)
        for q in args.queries:
            hits = results[q]
            print(json.dumps(
                {"results": [{"doc_id": d, "score": s} for d, s in hits],
                 "total_count": len(hits), "limit": args.k, "offset": 0,
                 "query": q}, default=str))
        if not preexisting:
            spark.stop()
        return 0

    for q in args.queries:
        if args.mode == "boolean":
            rows = qe.boolean_top_k_df(q, k=args.k,
                                       synonyms=synonyms).collect()
            hits = [(int(r["doc_id"]), float(r["score"])) for r in rows]
            out = {"results": [{"doc_id": d, "score": s} for d, s in hits],
                   "total_count": len(hits), "limit": args.k, "offset": 0,
                   "query": q}
        elif args.mode == "fuzzy":
            hits, corrections = qe.fuzzy_top_k(q, k=args.k)
            out = {"results": [{"doc_id": d, "score": s} for d, s in hits],
                   "total_count": len(hits), "limit": args.k, "offset": 0,
                   "query": q, "corrections": corrections}
        elif args.mode == "hybrid" and not (args.lang or args.offset
                                            or args.min_score):
            # bare hybrid keeps the per-path ranks for explainability
            rows = qe.hybrid_top_k_df(q, k=args.k).collect()
            out = {"results": [{"doc_id": int(r["doc_id"]),
                                "rrf_score": float(r["rrf_score"]),
                                "lex_rank": r["lex_rank"],
                                "sem_rank": r["sem_rank"]} for r in rows],
                   "total_count": len(rows), "limit": args.k, "offset": 0,
                   "query": q}
        elif args.mode in ("hybrid", "semantic"):
            # filtered/paged vector modes serve the full search() envelope
            out = qe.search(q, k=args.k, offset=args.offset,
                            min_score=args.min_score, lang=args.lang,
                            count_mode="none", mode=args.mode)
        elif args.mode == "impact":
            hits = qe.impact_top_k(q, k=args.k)
            out = {"results": [{"doc_id": d, "score": s} for d, s in hits],
                   "total_count": len(hits), "limit": args.k, "offset": 0,
                   "query": q, "approximate": True}
        elif args.mode == "prf":
            expansion = qe.expansion_terms(q)
            hits = qe.prf_top_k(q, k=args.k, expansion=expansion)
            out = {"results": [{"doc_id": d, "score": s} for d, s in hits],
                   "total_count": len(hits), "limit": args.k, "offset": 0,
                   "query": q, "expansion_terms": expansion}
        elif synonyms is not None and (
                args.lang is None and args.min_score == 0.0
                and args.offset == 0 and args.count == "none"):
            rows = qe.synonym_top_k_df(q, synonyms, k=args.k).collect()
            hits = [(int(r["doc_id"]), float(r["score"])) for r in rows]
            out = {"results": [{"doc_id": d, "score": s} for d, s in hits],
                   "total_count": len(hits), "limit": args.k, "offset": 0,
                   "query": q}
        elif (args.lang is None and args.min_score == 0.0
                and args.offset == 0 and args.count == "none"
                and "site:" not in q.lower()):
            # simple case: bare top-k honoring --mode (wand OR exhaustive)
            hits = qe.top_k(q, k=args.k, mode=args.mode)
            out = {"results": [{"doc_id": d, "score": s} for d, s in hits],
                   "total_count": len(hits), "limit": args.k, "offset": 0,
                   "query": q}
        else:
            if synonyms is not None:
                print("--synonyms supports bare top-k and boolean mode "
                      "only (no filters/offset/count)", file=sys.stderr)
                return 2
            # site:/-site: operators in the query string become
            # structured host filters (extract_site_filters)
            from semantic_search_engine_spark.plans.boolean import (
                extract_site_filters,
            )
            clean_q, site, neg_site = extract_site_filters(q)
            out = qe.search(clean_q, k=args.k, offset=args.offset,
                            min_score=args.min_score, lang=args.lang,
                            count_mode=args.count, mode=args.mode,
                            site=site, neg_site=neg_site)
            out["query"] = q
        print(json.dumps(out, default=str))
    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
