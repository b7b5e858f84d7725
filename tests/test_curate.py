"""Training-corpus curation operators (SURVEY.md §2.3 X62): quality
signals/gate, deterministic stratified sampling, exact token-budget prefix
selection, FFD sequence packing, sharded export — each pinned against an
independent single-node oracle over the driver's `documents` table."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.curate import (
    curate,
    export_shards,
    pack_sequences,
    quality_signals,
    sample_quota,
    sample_stratified,
    select_token_budget,
)

SF_DIR = "/root/testdata/sf0.01"

_PUNCT = set(".,;:!?'\"()[]{}-")
_STOP = {"the", "of", "and", "to", "in", "a", "is", "that", "for",
         "it", "as", "was", "with", "be", "by", "on", "not", "he",
         "i", "this", "are", "or", "his", "from", "at", "which"}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


def _py_signals(text: str) -> dict:
    toks = text.strip().split() if text.strip() else []
    n = len(toks)
    n_chars = len(text)
    alpha = sum(1 for c in text if ("a" <= c <= "z") or ("A" <= c <= "Z"))
    digit = sum(1 for c in text if "0" <= c <= "9")
    punct = sum(1 for c in text if c in _PUNCT)
    low = [t.lower() for t in toks]
    stop = sum(1 for t in low if t in _STOP)
    return {
        "n_tokens": n,
        "chars_per_token": n_chars / max(n, 1),
        "ttr": (len(set(low)) / n) if n else 0.0,
        "alpha_ratio": (alpha / n_chars) if n_chars else 0.0,
        "digit_ratio": (digit / n_chars) if n_chars else 0.0,
        "punct_ratio": (punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (stop / n) if n else 0.0,
    }


def test_quality_signals_match_python(docs, docs_pd):
    got = {int(r["doc_id"]): r.asDict()
           for r in quality_signals(docs).collect()}
    checked = 0
    for row in docs_pd.itertuples(index=False):
        if row.text is None:
            continue
        want = _py_signals(row.text)
        g = got[int(row.doc_id)]
        for k, v in want.items():
            assert g[k] == pytest.approx(v, rel=1e-12, abs=1e-12), (
                row.doc_id, k)
        checked += 1
    assert checked > 100


def test_curate_matches_python_gate(docs, docs_pd):
    kw = dict(min_tokens=20, max_tokens=5000, min_alpha_ratio=0.5,
              max_digit_ratio=0.35, min_ttr=0.2)
    got = {int(r["doc_id"])
           for r in curate(docs, langs=["en", "de"], **kw)
           .select("doc_id").collect()}
    want = set()
    for row in docs_pd.itertuples(index=False):
        if row.text is None or row.lang not in ("en", "de"):
            continue
        s = _py_signals(row.text)
        if (kw["min_tokens"] <= s["n_tokens"] <= kw["max_tokens"]
                and s["alpha_ratio"] >= kw["min_alpha_ratio"]
                and s["digit_ratio"] <= kw["max_digit_ratio"]
                and s["ttr"] >= kw["min_ttr"]):
            want.add(int(row.doc_id))
    assert got == want
    assert 0 < len(got) < len(docs_pd)


# ---------------------------------------------------------------- sampling
def _ids(df):
    return {int(r["doc_id"]) for r in df.select("doc_id").collect()}


def test_stratified_sample_deterministic_and_monotone(docs):
    a1 = _ids(sample_stratified(docs, {"en": 0.3, "de": 0.6}, seed=7))
    a2 = _ids(sample_stratified(docs, {"en": 0.3, "de": 0.6}, seed=7))
    assert a1 == a2  # same corpus + seed ⇒ same sample
    # threshold monotonicity: growing a fraction only ADDS members —
    # the stability property a rolling crawl needs
    bigger = _ids(sample_stratified(docs, {"en": 0.5, "de": 0.8}, seed=7))
    assert a1 <= bigger
    # a different seed draws an (almost surely) different sample
    other = _ids(sample_stratified(docs, {"en": 0.3, "de": 0.6}, seed=8))
    assert other != a1
    # strata outside the map fall to default_fraction=0
    sampled_langs = {r["lang"] for r in sample_stratified(
        docs, {"en": 0.3}, seed=7).select("lang").collect()}
    assert sampled_langs == {"en"}


def test_stratified_fraction_is_roughly_respected(docs):
    n_en = docs.filter(F.col("lang") == "en").count()
    got = sample_stratified(docs, {"en": 0.4}, seed=3).count()
    assert abs(got - 0.4 * n_en) < 0.2 * n_en + 10  # loose statistical bound


def test_quota_sample_exact_counts(docs):
    quotas = {"en": 25, "de": 10_000}  # de quota exceeds stratum size
    out = sample_quota(docs, quotas, seed=1)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_de = docs.filter(F.col("lang") == "de").count()
    assert counts.get("en", 0) == 25
    assert counts.get("de", 0) == n_de
    assert set(counts) == {"en", "de"}  # other strata dropped
    # deterministic
    assert _ids(out) == _ids(sample_quota(docs, quotas, seed=1))


# ---------------------------------------------------------- token budget
def test_token_budget_exact_prefix(docs, docs_pd):
    sig = quality_signals(docs)
    enriched = docs.join(sig.select("doc_id", "n_tokens"), "doc_id")
    # priority: n_chars (a real-valued column with ties); budget ~30%
    rows = []
    for row in docs_pd.itertuples(index=False):
        if row.text is None:
            continue
        rows.append((int(row.doc_id), _py_signals(row.text)["n_tokens"],
                     int(row.n_chars)))
    total = sum(t for _, t, _ in rows)
    budget = int(total * 0.3)
    got = _ids(select_token_budget(
        enriched.filter(F.col("text").isNotNull()), budget,
        priority_col="n_chars", n_bins=16))
    # oracle: global (priority DESC, doc_id ASC) prefix while sum<=budget
    want = set()
    run = 0
    for did, t, pr in sorted(rows, key=lambda x: (-x[2], x[0])):
        if run + t > budget:
            break
        run += t
        want.add(did)
    assert got == want
    assert run <= budget


def test_token_budget_degenerate_and_full(docs):
    sig = quality_signals(docs)
    enriched = (docs.filter(F.col("text").isNotNull())
                .join(sig.select("doc_id", "n_tokens"), "doc_id"))
    total = enriched.agg(F.sum("n_tokens")).collect()[0][0]
    # budget covers everything → identity
    assert (select_token_budget(enriched, int(total) + 1,
                                priority_col="n_chars").count()
            == enriched.count())
    # constant priority → pure doc_id-ordered prefix (single-bin path)
    const = enriched.withColumn("p", F.lit(1.0))
    got = _ids(select_token_budget(const, int(total) // 2,
                                   priority_col="p"))
    rows = sorted((int(r["doc_id"]), int(r["n_tokens"]))
                  for r in enriched.select("doc_id", "n_tokens").collect())
    want, run = set(), 0
    for did, t in rows:
        if run + t > total // 2:
            break
        run += t
        want.add(did)
    assert got == want


# ------------------------------------------------------------- packing
def test_pack_sequences_partition_and_capacity(docs, spark):
    sig = quality_signals(docs.filter(F.col("text").isNotNull()))
    cap = 60  # below the longest docs so overflow sequences occur
    packed = pack_sequences(sig, cap, n_buckets=8).collect()
    toks = {int(r["doc_id"]): int(r["n_tokens"]) for r in
            sig.select("doc_id", "n_tokens").collect()}
    seen: list[int] = []
    for r in packed:
        members = [int(d) for d in r["doc_ids"]]
        seen.extend(members)
        assert r["seq_tokens"] == sum(toks[d] for d in members)
        if r["overflow"]:
            assert len(members) == 1 and toks[members[0]] > cap
        else:
            assert r["seq_tokens"] <= cap
        assert r["n_docs"] == len(members)
        assert r["seq_id"] >> 32 == r["bucket"]
    # exactly-once partition of the corpus
    assert sorted(seen) == sorted(toks)


def test_pack_sequences_matches_python_ffd(docs, spark):
    sig = quality_signals(docs.filter(F.col("text").isNotNull()))
    cap = 60
    n_buckets = 8
    slim = (sig.select(
        "doc_id", "n_tokens",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        .alias("bucket")).collect())
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for r in slim:
        by_bucket.setdefault(int(r["bucket"]), []).append(
            (int(r["n_tokens"]), int(r["doc_id"])))
    want: dict[int, list[int]] = {}  # seq_id -> doc_ids in placement order
    for bucket, items in by_bucket.items():
        items.sort(key=lambda x: (-x[0], x[1]))
        bins: list[list[int]] = []
        fill: list[int] = []
        over: list[bool] = []
        for t, did in items:
            if t > cap:
                bins.append([did]); fill.append(t); over.append(True)
                continue
            for bi in range(len(bins)):
                if not over[bi] and fill[bi] + t <= cap:
                    bins[bi].append(did); fill[bi] += t
                    break
            else:
                bins.append([did]); fill.append(t); over.append(False)
        for bi, members in enumerate(bins):
            want[(bucket << 32) | bi] = members
    got = {int(r["seq_id"]): [int(d) for d in r["doc_ids"]]
           for r in pack_sequences(sig, cap, n_buckets=n_buckets).collect()}
    assert got == want


# -------------------------------------------------------------- export
def test_export_shards_roundtrip_and_manifest(docs, spark, tmp_path):
    out = str(tmp_path / "shards")
    src = docs.filter(F.col("text").isNotNull())
    sig = quality_signals(src)
    enriched = src.join(sig.select("doc_id", "n_tokens"), "doc_id")
    manifest = export_shards(enriched, out, n_shards=4,
                             tokens_col="n_tokens").collect()
    back = spark.read.parquet(out)
    assert _ids(back) == _ids(enriched)
    # shard assignment is the documented pure function of doc_id
    bad = back.filter(
        F.col("shard")
        != F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int")).count()
    assert bad == 0
    mf = {int(r["shard"]): (int(r["n_docs"]), int(r["total_tokens"]))
          for r in manifest}
    chk = {int(r["shard"]): (int(r["n"]), int(r["t"])) for r in
           back.groupBy("shard").agg(
               F.count("*").alias("n"),
               F.sum("n_tokens").alias("t")).collect()}
    assert mf == chk
    assert set(mf) == {0, 1, 2, 3}
