"""Unit + property tests for the hierarchy walk operator
(laion_spark/operators/hierarchy.py — ClickHouse dictGetHierarchy
analog, catalog e31) and the session-3 scalar helpers.

The Spark walk is checked against a pure-Python pointer-chase on
randomly generated forests (hypothesis builds the parent maps), and
the catalog's mixing-hash parent formula is verified to satisfy the
invariants the 21-round depth bound relies on: parent(k) < k and
parent(k) <= 3k/8 (stronger than the module's documented halving
contract, so depth <= log_8/3(max key)).
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


def _py_parent(k: int) -> int:
    if k <= 3:
        return 0
    return k // 4 + (k * 2654435761) % (k // 8 + 1)


@given(k=st.integers(1, 10_000_000))
def test_parent_formula_invariants(k):
    """parent(k) < k (the walk terminates) and parent(k) <= 3k/8
    (depth <= log_8/3(max key), so 21 rounds cover 10^8+ keys — the
    original parent <= 3k/4 formula overflowed the cap at 20k keys)."""
    p = _py_parent(k)
    assert 0 <= p < k
    if k >= 4:
        assert k // 4 <= p <= 3 * k // 8


def _py_depth(node: int, parent: dict[int, int], root: int = 0) -> int:
    d, cur = 0, node
    while cur != root:
        cur = parent.get(cur, root)
        d += 1
    return d


@pytest.fixture(scope="module")
def forest(spark):
    """One representative random forest: nodes 1..80 with parents drawn
    by the mixing formula (guaranteed acyclic since parent < node)."""
    rows = [(k, _py_parent(k)) for k in range(1, 81)]
    return rows, spark.createDataFrame(rows, "node long, parent long")


def test_resolve_depths_matches_python_walk(spark, forest):
    from laion_spark.operators.hierarchy import resolve_depths

    rows, dict_df = forest
    parent = dict(rows)
    got = {r["node"]: r["depth"] for r in resolve_depths(dict_df).collect()}
    want = {k: _py_depth(k, parent) for k, _ in rows}
    assert got == want


def test_with_ancestors_chains_broadcast_lookups(spark, forest):
    from laion_spark.operators.hierarchy import resolve_depths, with_ancestors

    rows, dict_df = forest
    parent = dict(rows)
    out = with_ancestors(resolve_depths(dict_df), dict_df, levels=3)
    for r in out.collect():
        a1 = parent.get(r["node"], 0)
        a2 = parent.get(a1, 0)
        a3 = parent.get(a2, 0)
        assert (r["anc1"], r["anc2"], r["anc3"]) == (a1, a2, a3)


def test_depth_cap_leaves_unreached_nodes_at_bound(spark):
    """A chain deeper than max_depth stops at the bound instead of
    looping — the documented cycle/over-depth containment contract."""
    from laion_spark.operators.hierarchy import resolve_depths

    chain = [(k, k - 1) for k in range(1, 11)]  # depth of node 10 is 10
    dict_df = spark.createDataFrame(chain, "node long, parent long")
    rows = {r["node"]: r for r in resolve_depths(dict_df, max_depth=4).collect()}
    assert rows[3]["depth"] == 3
    assert rows[10]["depth"] == 4  # capped, not looped
    # the strictness flag distinguishes capped nodes from resolved ones
    assert rows[3]["reached_root"] is True
    assert rows[10]["reached_root"] is False


# --- canonicalize_url / pii helpers (functions/text.py) ---------------------


_url_part = st.sampled_from(["a", "b", "x1", "page", "idx"])


@pytest.fixture(scope="module")
def url_df_maker(spark):
    def make(urls):
        return spark.createDataFrame([(u,) for u in urls], "url string")

    return make


def test_canonicalize_url_cases(spark, url_df_maker):
    from laion_spark.functions.text import canonicalize_url

    cases = {
        "HTTPS://WWW.Ex.COM/a/?utm_source=f&ref=1#frag": "https://ex.com/a/?ref=1",
        "https://ex.com/a?ref=1&utm_campaign=x": "https://ex.com/a?ref=1",
        "https://ex.com/a/": "https://ex.com/a",
        "http://Ex.com/a?utm_source=f": "http://ex.com/a",
    }
    df = url_df_maker(list(cases)).select("url", canonicalize_url("url").alias("c"))
    got = {r["url"]: r["c"] for r in df.collect()}
    assert got == cases


@settings(max_examples=8, deadline=None)
@given(host=_url_part, path=_url_part, ref=st.integers(0, 9),
       www=st.booleans(), frag=st.booleans(), utm=st.booleans())
def test_canonicalize_url_idempotent(spark, url_df_maker, host, path, ref, www, frag, utm):
    """canon(canon(u)) == canon(u): already-canonical URLs never change."""
    from laion_spark.functions.text import canonicalize_url

    u = (
        ("https://" + ("www." if www else "")) + host + ".com/" + path
        + ("?utm_source=f&ref=%d" % ref if utm else "?ref=%d" % ref)
        + ("#s" if frag else "")
    )
    df = url_df_maker([u]).select(canonicalize_url("url").alias("c1"))
    df = df.select("c1", canonicalize_url("c1").alias("c2"))
    row = df.collect()[0]
    assert row["c1"] == row["c2"]


def test_pii_counts_and_flag(spark):
    from laion_spark.functions.text import pii_counts, pii_flag

    df = spark.createDataFrame(
        [
            ("mail me at a.b@ex.org or c@d.io",),
            ("call +1-555-0102 from 10.0.0.1",),
            ("dial +1-555-123-4567 today",),
            ("both +1-555-123-4567 and +1-555-0102",),
            ("clean text with no identifiers",),
        ],
        "t string",
    )
    pc = pii_counts("t")
    got = df.select(
        pc["email"].alias("e"), pc["nanp_phone"].alias("p"),
        pc["ipv4"].alias("i"), pii_flag("t").alias("f"),
    ).collect()
    assert [(r["e"], r["p"], r["i"], r["f"]) for r in got] == [
        (2, 0, 0, 1), (0, 1, 1, 1), (0, 1, 0, 1), (0, 2, 0, 1), (0, 0, 0, 0),
    ]


def test_time_slot_sequence_covers_interval(spark):
    from laion_spark.functions.time import time_slot_sequence

    w = 1_800_000_000
    df = spark.createDataFrame(
        [(w * 3 + 5, w * 2), (w * 7, 0)], "ts_us long, dur_us long"
    )
    got = df.select(
        F.expr("ts_us"), time_slot_sequence("ts_us", "dur_us", w).alias("s")
    ).collect()
    assert got[0]["s"] == [w * 3, w * 4, w * 5]  # straddles three slots
    assert got[1]["s"] == [w * 7]  # zero duration -> its own slot


def test_time_slot_sequence_negative_timestamps(spark):
    """Pre-1970 timestamps must floor DOWN to the grid (pmod), not
    round toward zero — a plain % would skip the interval's first
    slot for negative epoch micros (ADVICE r7)."""
    from laion_spark.functions.time import time_slot_sequence

    w = 1_800_000_000
    df = spark.createDataFrame(
        [(-w - 5, w), (-5, 10)], "ts_us long, dur_us long"
    )
    got = df.select(time_slot_sequence("ts_us", "dur_us", w).alias("s")).collect()
    assert got[0]["s"] == [-2 * w, -w]  # starts in slot [-2w, -w)
    assert got[1]["s"] == [-w, 0]  # crosses the epoch boundary
