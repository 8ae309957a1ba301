"""Connected components: correctness, chains, determinism."""

from tildener_spark.config import EngineConfig
from tildener_spark.operators.components import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def comp_sets(rows):
    groups = {}
    for r in rows:
        groups.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(v) for v in groups.values()}


def test_two_components(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    got = comp_sets(connected_components(e).collect())
    assert got == {frozenset({"a", "b", "c"}), frozenset({"x", "y"})}


def test_long_chain_converges(spark):
    nodes = [f"n{i:02d}" for i in range(12)]
    e = _edges(spark, list(zip(nodes, nodes[1:])))
    got = comp_sets(connected_components(e).collect())
    assert got == {frozenset(nodes)}


def test_representative_is_min_node(spark):
    e = _edges(spark, [("z", "m"), ("m", "a")])
    rows = connected_components(e).collect()
    assert all(r["component"] == "a" for r in rows)


def test_deterministic(spark):
    e = _edges(spark, [("a", "b"), ("c", "b"), ("d", "e")])
    r1 = sorted(map(tuple, connected_components(e).collect()))
    r2 = sorted(map(tuple, connected_components(e).collect()))
    assert r1 == r2


def test_salting_config_does_not_change_result(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
    r1 = comp_sets(connected_components(e, EngineConfig(salt_buckets=1)).collect())
    r2 = comp_sets(connected_components(e, EngineConfig(salt_buckets=64)).collect())
    assert r1 == r2


def test_distributed_path_matches_driver_path(spark):
    # force the iterated-join path and compare against the driver
    # union-find fast path on the same graph
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y"),
                       ("y", "z"), ("z", "x"), ("q", "q")])
    driver = sorted(map(tuple, connected_components(
        e, EngineConfig(cc_driver_threshold=10**6)).collect()))
    dist = sorted(map(tuple, connected_components(
        e, EngineConfig(cc_driver_threshold=0)).collect()))
    assert driver == dist


def test_non_convergence_raises(spark):
    # a path graph longer than the iteration cap cannot finish
    # propagating the min label; strict mode must raise instead of
    # silently returning partial labels (VERDICT r01)
    import pytest
    from tildener_spark.operators.components import CCNotConverged
    nodes = [f"n{i:02d}" for i in range(10)]
    e = _edges(spark, list(zip(nodes, nodes[1:])))
    cfg = EngineConfig(cc_max_iterations=2, cc_driver_threshold=0)
    with pytest.raises(CCNotConverged):
        connected_components(e, cfg)
    # non-strict: warns and returns the partial labels
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(e, cfg, strict=False)
        assert out.count() == len(nodes)
        assert any("did not converge" in str(x.message) for x in w)
