"""Physical-plan audit over every __spark_entry__.queries() entry.

For each query, prints the scan/exchange/join shape that matters at
100 TB: pushed filters, read schemas (column pruning), broadcast vs
shuffle joins, number of exchanges, whole-stage-codegen coverage, and
any row-at-a-time Python (BatchEvalPython — should NEVER appear; all
Python must be ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas).

Usage: python scripts/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SKIP_PREFIX = ("kg_",)  # pipeline queries audited via their own runs


def _dup_py_udfs(plan: str) -> list[str]:
    """Python UDF expressions evaluated at 2+ plan sites.

    Catalyst can clone a deterministic UDF when pushing an inferred
    filter (e.g. explode's size()>0) past an Aggregate or Project —
    round 3 caught minhash-banding re-running over every pre-distinct
    row this way (operators/linking.py).  The clone keeps the SAME
    expression result id (name(...)#NNN), so repeated (name, id)
    pairs across ArrowEvalPython nodes mean the same logical UDF call
    executes more than once per row stream."""
    seen: dict[tuple[str, str], int] = {}
    for seg in re.findall(r"ArrowEvalPython \[([^\]]*)\]", plan):
        # args routinely contain attr ids (x#39.doc_canonical), so
        # match lazily up to the first ")#<id>" — the clone keeps the
        # result id even when the arg exprs got rewritten
        for fname, rid in re.findall(r"(\w+)\(.*?\)#(\d+)", seg):
            seen[(fname, rid)] = seen.get((fname, rid), 0) + 1
    return sorted(f"{f}#{r}x{c}" for (f, r), c in seen.items() if c > 1)


_EXPENSIVE = ("regexp_replace(", "regexp_extract_all(", "md5(",
              "sha2(", "transform(", "zip_with(")


def _dup_exprs(plan: str, min_len: int = 40) -> list[str]:
    """Identical expensive expression subtrees evaluated 2+ times
    within one plan node.

    Interpreted expression eval (higher-order lambdas, Generate,
    non-codegen filters) has no common-subexpression elimination, so
    a repeated subtree re-runs per reference — and inside a transform
    lambda, once per OUTPUT ELEMENT (round 3: the q11 shingle build
    re-ran regexp+split ~52x per doc; lang-id ~17x; simhash re-ran
    its md5 transform 2x bits times).  The engine's rule is to stage
    such arrays as projected columns (dedup.word_tokens doc); this
    check catches regressions, including Catalyst rules that
    re-inline the staged expression (InferFiltersFromGenerate, now
    excluded in session.py).  Identical TEXT is the signal — distinct
    subtrees sharing a function name (cosine's three aggregates) do
    not match."""
    dups: set[str] = set()
    for line in plan.splitlines():
        for fn in _EXPENSIVE:
            starts = [m.start() for m in re.finditer(re.escape(fn), line)]
            if len(starts) < 2:
                continue
            exprs: dict[str, int] = {}
            for s in starts:
                depth = 0
                for i in range(s, min(len(line), s + 2000)):
                    c = line[i]
                    if c == "(":
                        depth += 1
                    elif c == ")":
                        depth -= 1
                        if depth == 0:
                            e = line[s:i + 1]
                            if len(e) >= min_len:
                                exprs[e] = exprs.get(e, 0) + 1
                            break
            for e, c in exprs.items():
                if c >= 2:
                    dups.add(f"{e[:60]}…x{c}")
    return sorted(dups)


def audit(name: str, plan: str) -> dict:
    return {
        "dup_py": _dup_py_udfs(plan),
        "dup_expr": _dup_exprs(plan),
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)",
                                    plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        # BNLJ whose only purpose is attaching a 1-row global
        # aggregate (scalar corpus totals — crossJoin(broadcast(
        # df.agg(...)))) is the textbook scalar-subquery pattern,
        # not an all-pairs join: every grouping-key-free final
        # HashAggregate emits exactly one row
        "scalar_aggs": plan.count("HashAggregate(keys=[]"),
        "arrow_py": plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas"),
        "slow_py": plan.count("BatchEvalPython"),
        "wsc_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed": sorted(set(re.findall(
            r"PushedFilters: \[([^\]]*)\]", plan)) - {""}),
        "read_schemas": sorted(set(re.findall(
            r"ReadSchema: struct<([^>]*)>", plan))),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from tildener_spark import get_spark
    import __spark_entry__ as M

    spark = get_spark(app_name="plan-audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    problems = []
    for name, fn in M.queries().items():
        if name.startswith(SKIP_PREFIX) or (only and name not in only):
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # driver-side collect queries etc.
            print(f"{name:32s} (driver-side: {type(e).__name__})")
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(name, plan)
        flags = []
        if a["slow_py"]:
            flags.append("ROW-PYTHON!")
        if a["dup_py"]:
            flags.append("DUP-PY-UDF!" + ",".join(a["dup_py"]))
        if a["dup_expr"]:
            flags.append("DUP-EXPR!" + ";".join(a["dup_expr"]))
        if a["cartesian"] or a["bnlj"]:
            # benign cases: q18/q19 declared exact baselines; q59's
            # src_a < src_b matrix join over per-source TOTALS (one
            # row per source, S^2 output by definition); q75's
            # src_a < src_b pair join over per-source KMV SKETCHES
            # (one k-array row per source — bounded by construction,
            # the sketch's whole point); and pure scalar-aggregate
            # broadcasts (every BNLJ covered by a 1-row keys=[]
            # aggregate, no CartesianProduct) — the
            # crossJoin(broadcast(df.agg(...))) corpus-totals idiom
            # (q51 n_docs/avgdl, q52 target/raw totals)
            scalar_only = (not a["cartesian"]
                           and a["scalar_aggs"] >= a["bnlj"])
            flags.append("CROSS-JOIN" + (
                " (declared ok)" if name in (
                    "q18_embedding_topk", "q19_embedding_neardup",
                    "q59_source_overlap", "q75_kmv_setops")
                else (" (scalar-broadcast ok)" if scalar_only
                      else "!")))
        if a["smj"] and not a["bhj"]:
            flags.append("no-broadcast")
        line = (f"{name:32s} exch={a['exchanges']:2d} "
                f"bhj={a['bhj']} smj={a['smj']} shj={a['shj']} "
                f"arrowPy={a['arrow_py']} wsc={a['wsc_spans']:2d} "
                f"{' '.join(flags)}")
        print(line)
        for s in a["read_schemas"]:
            cols = s.count(":")
            print(f"    scan cols={cols}: {s[:100]}")
        for p in a["pushed"][:3]:
            print(f"    pushed: {p[:100]}")
        if any("!" in f for f in flags):
            problems.append(name)
    print("\nproblems:", problems or "none")
    spark.stop()


if __name__ == "__main__":
    main()
