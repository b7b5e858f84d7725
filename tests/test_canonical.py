"""Redirect/canonical resolution: chain terminals, cycle flagging,
functionalization, corpus application, and a random functional-graph
oracle (seeded walk with cycle detection)."""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.canonical import (
    apply_canonical, functionalize, resolve_canonical)

EDGE_SCHEMA = "src_url string, dst_url string"


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    return {r.url: (r.canonical_url, r.resolved)
            for r in resolve_canonical(df, **kw).collect()}


def test_chain_resolves_to_terminal(spark):
    got = _resolve(spark, [("a", "b"), ("b", "c")])
    assert got == {"a": ("c", True), "b": ("c", True), "c": ("c", True)}


def test_shared_sink_and_branching_tails(spark):
    got = _resolve(spark, [("x1", "m"), ("x2", "m"), ("m", "sink")])
    assert {u: c for u, (c, _) in got.items()} == {
        "x1": "sink", "x2": "sink", "m": "sink", "sink": "sink"}
    assert all(r for _, r in got.values())


def test_cycle_gets_flagged_representative(spark):
    got = _resolve(spark, [("a", "b"), ("b", "a"), ("d", "a")])
    # cycle + its tail: deterministic component representative, flagged
    assert got["a"] == ("a", False)
    assert got["b"] == ("a", False)
    assert got["d"] == ("a", False)


def test_self_loop_is_a_sink_declaration(spark):
    got = _resolve(spark, [("a", "a"), ("b", "a")])
    assert got == {"a": ("a", True), "b": ("a", True)}


def test_conflicting_claims_functionalize_to_min(spark):
    df = spark.createDataFrame([("a", "c"), ("a", "b")], EDGE_SCHEMA)
    assert functionalize(df).collect()[0].next == "b"
    got = _resolve(spark, [("a", "c"), ("a", "b")])
    assert got["a"] == ("b", True)


def test_doubling_is_logarithmic_not_linear(spark):
    # 12-hop chain: true pointer doubling reaches 2^4 = 16 hops in 4
    # rounds; single-hop stepping would only reach 5 and wrongly flag
    # the chain head as cycle residue
    chain = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(12)]
    got = _resolve(spark, chain, max_doublings=4)
    assert got["c00"] == ("c12", True)
    assert all(c == "c12" and r for c, r in got.values())


def test_doubling_cap_flags_overlong_chains(spark):
    # 6-hop chain with max_doublings=1 -> 2 hops reachable -> unresolved
    chain = [(f"u{i}", f"u{i+1}") for i in range(6)]
    got = _resolve(spark, chain, max_doublings=1)
    assert got["u0"][1] is False
    full = _resolve(spark, chain)  # default cap resolves it
    assert full["u0"] == ("u6", True)


def test_apply_canonical_coalesces_to_self(spark):
    edges = spark.createDataFrame([("a", "b")], EDGE_SCHEMA)
    docs = spark.createDataFrame(
        [("a", 1), ("b", 2), ("never-redirected", 3)], "url string, x int")
    out = {r.url: r.canonical_url
           for r in apply_canonical(docs, resolve_canonical(edges),
                                    broadcast_mapping=True).collect()}
    assert out == {"a": "b", "b": "b",
                   "never-redirected": "never-redirected"}


def _walk_oracle(f: dict[str, str]) -> dict[str, tuple[str | None, bool]]:
    """Reference resolution: walk each chain; terminating walks yield
    (sink, True), walks that revisit a node yield (None, False)."""
    out = {}
    nodes = set(f) | set(f.values())
    for u in nodes:
        seen, cur = {u}, u
        while cur in f:
            cur = f[cur]
            if cur in seen:
                out[u] = (None, False)
                break
            seen.add(cur)
        else:
            out[u] = (cur, True)
    return out


def test_random_functional_graph_matches_walk_oracle(spark):
    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(60)]
    f = {u: rng.choice(nodes) for u in nodes if rng.random() < 0.8}
    f = {u: v for u, v in f.items() if u != v}  # self-loops = sinks
    edges = spark.createDataFrame(list(f.items()), EDGE_SCHEMA)
    got = {r.url: (r.canonical_url, r.resolved)
           for r in resolve_canonical(edges).collect()}
    want = _walk_oracle(f)
    assert set(got) == set(want)
    for u, (sink, ok) in want.items():
        assert got[u][1] is ok, u
        if ok:
            assert got[u][0] == sink, u
    # unresolved urls draining into the same structure share one
    # deterministic representative: same sink-less walk -> same label
    reps = {}
    for u, (sink, ok) in want.items():
        if ok:
            continue
        # identify the structure by the min url on the walk's cycle
        seen, order, cur = set(), [], u
        while cur not in seen:
            seen.add(cur)
            order.append(cur)
            cur = f[cur]
        cyc = order[order.index(cur):]
        reps.setdefault(min(cyc), set()).add(got[u][0])
    for labels in reps.values():
        assert len(labels) == 1
