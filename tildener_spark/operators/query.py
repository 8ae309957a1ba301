"""Declarative graph-pattern queries over the canonical KG — a
SPARQL-basic-graph-pattern surface compiled to DataFrame equi-joins.

A consumer of the constructed KG asks conjunctive questions ("which
PERs work at an ORG located in ?z") without hand-writing joins; this
module compiles a list of (subj, pred, obj) patterns with shared
``?variables`` into a join tree:

* each triple pattern scans ``canon_triples`` with every literal
  pushed down as a filter (Catalyst sees plain predicates on the
  parquet scan — partition pruning and pushdown apply);
* patterns join in ascending estimated-cardinality order (counted
  per-pattern on the predicate/type profile — a vocabulary-sized
  aggregate, collected once), the classic selectivity-first BGP
  heuristic, so the intermediate result stays as small as the most
  selective pattern allows;
* every join key is a bound variable's node key (``type SEP canon``
  single-column hash), and patterns sharing no variable with the
  accumulated tree fall back to a (rare, explicit) cross join at the
  END of the order — never in the middle.

No reference analog (TildeNER has no query surface); this is the
"switch to my repo and keep asking your queries" API the KG tier
implies.  Everything is relational, so registered pattern queries
carry exact DuckDB oracles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from tildener_spark.operators.graphstats import SEP

__all__ = ["KGQuery"]


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


@dataclass(frozen=True)
class _Pattern:
    subj: str            # "?x" or "TYPE:canonical" literal
    pred: str            # "?p" or predicate literal
    obj: str


def _node_lit(term: str):
    typ, _, canon = term.partition(":")
    return F.lit(f"{typ}{SEP}{canon}")


class KGQuery:
    """Fluent conjunctive query builder.

    >>> KGQuery(ct).match("?x", "works", "?y") \\
    ...            .match("?y", "in", "?z") \\
    ...            .where_type("?x", "PER").select("?x", "?z")

    ``match`` terms: ``?var`` or a ``TYPE:canonical`` literal for
    nodes, ``?var`` or a literal for predicates.  ``select`` returns
    a DataFrame with ``<var>_type`` / ``<var>`` columns per selected
    node variable (predicate variables project as ``<var>`` only).
    """

    def __init__(self, canon_triples: DataFrame):
        self._ct = canon_triples
        self._patterns: list[_Pattern] = []
        self._types: dict[str, str] = {}

    def match(self, subj: str, pred: str, obj: str) -> "KGQuery":
        self._patterns.append(_Pattern(subj, pred, obj))
        return self

    def where_type(self, var: str, ne_type: str) -> "KGQuery":
        if not _is_var(var):
            raise ValueError(f"where_type needs a ?variable: {var}")
        self._types[var] = ne_type
        return self

    # ---------------------------------------------------- compile

    def _pattern_df(self, p: _Pattern, idx: int) -> DataFrame:
        """One scan of canon_triples with literals and type
        constraints pushed down; emitted columns are the pattern's
        variables (node vars as single ``type SEP canon`` keys)."""
        df = self._ct.select(
            F.concat_ws(SEP, "subj_type", "subj_canonical")
            .alias("_s"),
            F.col("subj_type").alias("_st"),
            F.col("pred").alias("_p"),
            F.concat_ws(SEP, "obj_type", "obj_canonical")
            .alias("_o"),
            F.col("obj_type").alias("_ot"),
        )
        if not _is_var(p.subj):
            df = df.filter(F.col("_s") == _node_lit(p.subj))
        elif p.subj in self._types:
            df = df.filter(F.col("_st") == self._types[p.subj])
        if not _is_var(p.pred):
            df = df.filter(F.col("_p") == F.lit(p.pred))
        if not _is_var(p.obj):
            df = df.filter(F.col("_o") == _node_lit(p.obj))
        elif p.obj in self._types:
            df = df.filter(F.col("_ot") == self._types[p.obj])

        # a variable repeated WITHIN one pattern is an equality
        # constraint (e.g. match("?x", "knows", "?x") = self-loops)
        if _is_var(p.subj) and p.subj == p.obj:
            df = df.filter(F.col("_s") == F.col("_o"))
        cols, seen = [], set()
        for term, col in ((p.subj, "_s"), (p.pred, "_p"),
                          (p.obj, "_o")):
            if _is_var(term) and term not in seen:
                seen.add(term)
                cols.append(F.col(col).alias(term[1:]))
        return df.select(*cols).distinct()

    def _plan(self) -> list[tuple[int, DataFrame, set[str]]]:
        """(pattern index, compiled scan, variable set) with
        per-pattern counts, ordered selectivity-first."""
        entries = []
        for i, p in enumerate(self._patterns):
            df = self._pattern_df(p, i)
            vs = {t[1:] for t in (p.subj, p.pred, p.obj)
                  if _is_var(t)}
            entries.append((i, df, vs, df.count()))
        entries.sort(key=lambda e: (e[3], e[0]))
        return [(i, df, vs) for i, df, vs, _ in entries]

    def select(self, *out_vars: str) -> DataFrame:
        if not self._patterns:
            raise ValueError("no match() patterns")
        # a variable bound in BOTH a node slot and the predicate
        # slot can never unify: node vars carry `type SEP canonical`
        # keys, predicate vars carry raw predicate strings — the
        # domains are disjoint, so silently deduplicating the column
        # (the old behavior) returned rows where the two occurrences
        # differ.  Reject it loudly instead (round-4 advisor).
        node_vars = {t for p in self._patterns
                     for t in (p.subj, p.obj) if _is_var(t)}
        pred_vars = {p.pred for p in self._patterns
                     if _is_var(p.pred)}
        both = node_vars & pred_vars
        if both:
            raise ValueError(
                "variable(s) used in both node and predicate "
                f"positions: {sorted(both)} — node variables bind "
                "`type␟ canonical` keys, predicate variables "
                "bind predicate strings; the domains are disjoint")
        plan = self._plan()
        # greedy: always join the next pattern that shares a bound
        # variable; patterns with no shared variable wait (a final
        # cross join only if the query is genuinely disconnected)
        (i0, acc, bound) = plan[0]
        rest = plan[1:]
        while rest:
            pick = next(
                (e for e in rest if e[2] & bound), rest[0])
            rest = [e for e in rest if e[0] != pick[0]]
            shared = sorted(pick[2] & bound)
            if shared:
                acc = acc.join(pick[1], shared)
            else:
                acc = acc.crossJoin(pick[1])
            bound |= pick[2]
        cols = []
        for v in out_vars:
            name = v[1:] if _is_var(v) else v
            if name not in bound:
                raise ValueError(f"unbound variable: {v}")
            is_node = any(
                _is_var(t) and t[1:] == name
                for p in self._patterns for t in (p.subj, p.obj))
            if is_node:
                cols.append(F.split_part(F.col(name), F.lit(SEP),
                                         F.lit(1))
                            .alias(f"{name}_type"))
                cols.append(F.split_part(F.col(name), F.lit(SEP),
                                         F.lit(2)).alias(name))
            else:
                cols.append(F.col(name))
        return acc.select(*cols).distinct()
