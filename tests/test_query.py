"""Graph-pattern query compiler (operators/query.py KGQuery).

kg_pattern's oracle pins one real query against DuckDB; these tests
pin the compiler's semantics on a hand graph: literal pushdown, type
constraints, predicate variables, shared-variable joins in any
declaration order, self-loop equality, and unbound-variable errors.
"""

import pytest

from tildener_spark.operators.query import KGQuery


def _ct(spark, rows):
    return spark.createDataFrame(
        rows, "subj_type string, subj_canonical string, pred string, "
              "obj_type string, obj_canonical string")


@pytest.fixture(scope="module")
def graph(spark):
    return _ct(spark, [
        ("PER", "alice", "works", "ORG", "acme"),
        ("PER", "bob", "works", "ORG", "acme"),
        ("PER", "carol", "works", "ORG", "globex"),
        ("ORG", "acme", "in", "LOC", "riga"),
        ("ORG", "globex", "in", "LOC", "oslo"),
        ("PER", "alice", "knows", "PER", "bob"),
        ("PER", "dave", "knows", "PER", "dave"),   # self-loop
    ]).persist()


def test_two_pattern_join(graph):
    rows = (KGQuery(graph)
            .match("?x", "works", "?y")
            .match("?y", "in", "?z")
            .select("?x", "?z").collect())
    got = {(r["x"], r["z"]) for r in rows}
    assert got == {("alice", "riga"), ("bob", "riga"),
                   ("carol", "oslo")}
    assert all(r["x_type"] == "PER" and r["z_type"] == "LOC"
               for r in rows)


def test_declaration_order_irrelevant(graph):
    a = {(r["x"], r["z"]) for r in
         KGQuery(graph).match("?x", "works", "?y")
         .match("?y", "in", "?z").select("?x", "?z").collect()}
    b = {(r["x"], r["z"]) for r in
         KGQuery(graph).match("?y", "in", "?z")
         .match("?x", "works", "?y").select("?x", "?z").collect()}
    assert a == b


def test_node_literal_and_type_filter(graph):
    rows = (KGQuery(graph)
            .match("?x", "works", "ORG:acme")
            .where_type("?x", "PER")
            .select("?x").collect())
    assert {r["x"] for r in rows} == {"alice", "bob"}


def test_predicate_variable(graph):
    rows = (KGQuery(graph)
            .match("PER:alice", "?p", "?y")
            .select("?p", "?y").collect())
    assert {(r["p"], r["y"]) for r in rows} == {
        ("works", "acme"), ("knows", "bob")}


def test_self_loop_equality(graph):
    rows = (KGQuery(graph)
            .match("?x", "knows", "?x")
            .select("?x").collect())
    assert {r["x"] for r in rows} == {"dave"}


def test_three_hop_chain(graph):
    rows = (KGQuery(graph)
            .match("?a", "knows", "?b")
            .match("?b", "works", "?y")
            .match("?y", "in", "?z")
            .select("?a", "?b", "?z").collect())
    assert {(r["a"], r["b"], r["z"]) for r in rows} == {
        ("alice", "bob", "riga")}


def test_unbound_select_raises(graph):
    with pytest.raises(ValueError, match="unbound"):
        KGQuery(graph).match("?x", "works", "?y").select("?q")


def test_node_and_predicate_position_var_raises(graph):
    # node vars bind `type SEP canonical` keys, predicate vars bind
    # raw predicate strings — the domains are disjoint, so a shared
    # variable can never unify and must be rejected (r4 advisor)
    with pytest.raises(ValueError, match="node and predicate"):
        KGQuery(graph).match("?x", "?x", "?y").select("?y")
    with pytest.raises(ValueError, match="node and predicate"):
        (KGQuery(graph).match("?a", "works", "?y")
         .match("?x", "?a", "?z").select("?y"))


def test_no_patterns_raises(graph):
    with pytest.raises(ValueError, match="no match"):
        KGQuery(graph).select("?x")


def test_empty_graph(spark):
    empty = _ct(spark, [])
    assert (KGQuery(empty)
            .match("?x", "works", "?y")
            .select("?x", "?y").count()) == 0
