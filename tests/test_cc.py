"""Connected-components unit graphs (SURVEY.md §5.2-2): chain, star,
two components, self-loop, no-edges identity."""

import pytest

from kgspark.cc import connected_components

DDL_NAMES = "name string"
DDL_EDGES = "name_a string, name_b string"


def _run(spark, names, edges):
    ndf = spark.createDataFrame([(n,) for n in names], DDL_NAMES)
    edf = spark.createDataFrame(edges, DDL_EDGES) if edges else (
        spark.createDataFrame([], DDL_EDGES)
    )
    return {
        r["name"]: r["canonical_id"]
        for r in connected_components(ndf, edf).collect()
    }


def test_chain(spark):
    got = _run(spark, list("abcde"), [("b", "a"), ("c", "b"), ("d", "c"), ("e", "d")])
    assert got == {x: "a" for x in "abcde"}


def test_star(spark):
    got = _run(spark, list("mabc"), [("m", "a"), ("m", "b"), ("m", "c")])
    assert got == {x: "a" for x in "mabc"}


def test_two_components_and_isolated(spark):
    got = _run(spark, list("abcxyz"), [("a", "b"), ("b", "c"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_self_loops_only(spark):
    got = _run(spark, list("pq"), [("p", "p"), ("q", "q")])
    assert got == {"p": "p", "q": "q"}


def test_no_edges_identity(spark):
    got = _run(spark, list("ab"), [])
    assert got == {"a": "a", "b": "b"}


@pytest.mark.parametrize("n", [33])
def test_long_chain_converges(spark, n):
    names = [f"n{i:03d}" for i in range(n)]
    edges = [(names[i], names[i + 1]) for i in range(n - 1)]
    got = _run(spark, names, edges)
    assert set(got.values()) == {"n000"}
