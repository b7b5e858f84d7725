"""Temperature mixture sampling (X93): shares pinned to the mT5
closed form, quota integerization + waterfilling by construction, and
deterministic hash selection."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.operators.mixture import (
    temperature_quotas,
    temperature_sample,
    temperature_shares,
)

COUNTS = {"en": 800, "de": 150, "sw": 50}


def test_shares_closed_form():
    # alpha=1: natural proportions
    s1 = temperature_shares(COUNTS, 1.0)
    assert s1 == pytest.approx({"en": 0.8, "de": 0.15, "sw": 0.05})
    # alpha=0: uniform over non-empty groups
    s0 = temperature_shares(COUNTS, 0.0)
    assert s0 == pytest.approx({g: 1 / 3 for g in COUNTS})
    # alpha=0.5: p^0.5 renormalized
    import math
    pw = {g: math.sqrt(c / 1000) for g, c in COUNTS.items()}
    z = sum(pw.values())
    assert temperature_shares(COUNTS, 0.5) == pytest.approx(
        {g: w / z for g, w in pw.items()})
    # tail share strictly rises as alpha falls
    assert (temperature_shares(COUNTS, 0.3)["sw"]
            > temperature_shares(COUNTS, 0.7)["sw"])
    # empty groups drop; empty input -> {}
    assert "x" not in temperature_shares({**COUNTS, "x": 0}, 0.5)
    assert temperature_shares({"x": 0}, 0.5) == {}
    with pytest.raises(ValueError):
        temperature_shares(COUNTS, 1.5)


def test_quotas_sum_and_proportions():
    q = temperature_quotas(COUNTS, 1.0, 100)
    assert sum(q.values()) == 100
    assert q == {"en": 80, "de": 15, "sw": 5}
    # budget above corpus: everything
    q_all = temperature_quotas(COUNTS, 0.5, 10_000)
    assert q_all == COUNTS
    assert temperature_quotas(COUNTS, 1.0, 0) == {}


def test_waterfilling_caps_small_groups():
    # alpha=0 with budget 300 wants 100 each, but sw has only 50:
    # the surplus re-splits over en/de (uniform among them)
    q = temperature_quotas(COUNTS, 0.0, 300)
    assert q["sw"] == 50
    assert q["en"] + q["de"] == 250
    assert abs(q["en"] - q["de"]) <= 1     # uniform re-split
    assert sum(q.values()) == 300


def test_sample_selects_exact_quotas(spark):
    rows = [(f"https://{g}{i}.x/", g)
            for g, c in COUNTS.items() for i in range(c // 10)]
    docs = spark.createDataFrame(rows, "url string, lang string")
    counts = {g: c // 10 for g, c in COUNTS.items()}
    got = temperature_sample(docs, "lang", 0.5, 40, seed=7)
    want = temperature_quotas(counts, 0.5, 40)
    by_g = {r["lang"]: 0 for r in got.collect()}
    for r in got.collect():
        by_g[r["lang"]] += 1
    assert by_g == want
    # deterministic: same seed -> same ids; new seed -> a fresh draw
    a = {r["url"] for r in
         temperature_sample(docs, "lang", 0.5, 40, seed=7).collect()}
    b = {r["url"] for r in
         temperature_sample(docs, "lang", 0.5, 40, seed=7).collect()}
    c = {r["url"] for r in
         temperature_sample(docs, "lang", 0.5, 40, seed=8).collect()}
    assert a == b
    assert a != c
    # empty budget
    assert temperature_sample(docs, "lang", 0.5, 0).count() == 0
