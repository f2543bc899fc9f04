"""SPARQL-style basic-graph-pattern (BGP) matching — a declarative
pattern veneer that COMPILES to the DataFrame join plan you would
have written by hand.

The reference queries its harvested graph imperatively (Python
loops over ent_tuples); the standard declarative interface to a
(subj, pred, obj) store is the SPARQL BGP: a set of triple patterns
sharing variables, semantics = natural join of the per-pattern
bindings. ``bgp_match`` takes patterns like::

    [("?c", "in_nation", "?n"),
     ("?s", "in_nation", "?n"),
     ("?n", "in_region", "r0")]

(terms starting with ``?`` are variables, everything else a
constant) and returns one column per variable.

Compilation — how each SPARQL semantic lands on Catalyst:

* Constants become scan-fused FILTERS on the triple table — one
  scan per pattern, predicate pushdown and partition/bucket pruning
  free (on a store partitioned by ``pred``, a constant-predicate
  pattern prunes to its partition).
* A variable repeated WITHIN a pattern (``("?x", "knows", "?x")``)
  becomes an intra-row equality filter, also scan-fused.
* Patterns join left-deep on their shared variables. Join order is
  chosen greedily most-constrained-first (most constants first,
  original order as tiebreak; each next pattern must share a
  variable with the bound set) — the textbook selectivity heuristic
  for the cost-blind case, after which AQE re-plans with real
  sizes. Equi-joins only, never theta.
* A pattern set whose variable graph is DISCONNECTED would compile
  to a cartesian product; that is almost always a query bug at
  10^12 edges, so it raises ``ValueError`` unless
  ``allow_product=True`` (mirroring Spark's own crossJoin
  explicitness).

Scale note: output cardinality is the BGP's — a star query over a
hub vertex is large because the DATA is, not the plan; per-pattern
filters always land before any join, and the per-variable equi-join
keys shuffle-partition evenly unless a single binding is hot
(then AQE skew-join splits it — same posture as q35).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _pattern_bindings(
    triples: DataFrame, pattern: Sequence[str]
) -> tuple[DataFrame, set[str]]:
    """One pattern → (bindings DataFrame with variable-named
    columns, set of variable names)."""
    if len(pattern) != 3:
        raise ValueError(f"triple pattern must have 3 terms: {pattern!r}")
    df = triples.select(*_POS_COLS)
    sel: dict[str, str] = {}  # var name -> first position column
    for pos, term in zip(_POS_COLS, pattern):
        if _is_var(term):
            var = term[1:]
            if not var:
                raise ValueError(f"empty variable name in {pattern!r}")
            if var in sel:  # repeated var inside the pattern
                df = df.filter(F.col(pos) == F.col(sel[var]))
            else:
                sel[var] = pos
        else:
            df = df.filter(F.col(pos) == F.lit(term))
    out = df.select(*[F.col(c).alias(v) for v, c in sel.items()])
    return out, set(sel)


def bgp_match(
    triples: DataFrame,
    patterns: Sequence[Sequence[str]],
    allow_product: bool = False,
    distinct: bool = True,
) -> DataFrame:
    """Match a basic graph pattern against a ``(subj, pred, obj)``
    table; returns one column per distinct variable (named without
    the ``?``), one row per solution mapping. ``distinct=True``
    gives SPARQL ``SELECT DISTINCT`` semantics (set of solutions);
    ``False`` keeps bag semantics."""
    if not patterns:
        raise ValueError("empty pattern list")
    parts = [_pattern_bindings(triples, p) for p in patterns]

    def n_consts(p: Sequence[str]) -> int:
        return sum(0 if _is_var(t) else 1 for t in p)

    order = sorted(
        range(len(parts)), key=lambda i: (-n_consts(patterns[i]), i)
    )
    remaining = list(order)
    first = remaining.pop(0)
    result, bound = parts[first]
    while remaining:
        nxt = None
        for idx in remaining:
            if parts[idx][1] & bound:
                nxt = idx
                break
        if nxt is None:
            if not allow_product:
                raise ValueError(
                    "disconnected BGP compiles to a cartesian product; "
                    "pass allow_product=True if that is intended"
                )
            nxt = remaining[0]
        remaining.remove(nxt)
        df, vs = parts[nxt]
        shared = sorted(vs & bound)
        if shared:
            result = result.join(df, shared, "inner")
        else:
            result = result.crossJoin(df)
        bound |= vs
    return result.distinct() if distinct else result
