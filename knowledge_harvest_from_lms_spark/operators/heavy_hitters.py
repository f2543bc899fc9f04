"""Exact heavy hitters via a Misra-Gries candidate pass + recount.

The query "every key with frequency > s·n" is the classic skew probe
(hot entities before a join, hot hosts before a crawl partition, hot
tokens before a vocab cut). The naive plan — groupBy(key).count()
then filter — shuffles EVERY distinct key; at 10^12 web-page tokens
that is the biggest shuffle in the pipeline for an answer whose size
is at most 1/s rows.

Plan here (two passes, bounded shuffle):

1. **Candidate pass** — one Arrow-batched ``mapInPandas`` runs a
   Misra-Gries summary (Misra & Gries 1982, "Finding repeated
   elements") with ``m = ceil(1/s)`` counters per partition and emits
   at most m candidate keys + the partition's row count. Output is
   ≤ m rows per partition, independent of key cardinality — this is
   the map-side combine the naive plan lacks. Pigeonhole gives the
   guarantee: freq(k) > s·n  ⇒  freq_p(k) > s·n_p in SOME partition,
   and MG with ≥ 1/s counters never evicts such a key [if every
   counter set dropped it, its local count ≤ n_p/(m+1) ≤ s·n_p].
   So candidates ⊇ true heavy hitters, ALWAYS — which is what makes
   the final answer exact and partitioning-independent (the oracle
   can replay it as plain GROUP BY ... HAVING).

2. **Recount pass** — the distinct candidate set (≤ m × partitions
   rows) broadcasts into a semi-join filter; exact counts aggregate
   over the surviving rows only. Final filter: count > s·n.

At 100 TB: pass 1 is a full scan with O(m) state and O(m) output per
partition; pass 2's shuffle carries only candidate-key rows. No
window functions, no driver collect of data rows (n comes back as
one scalar per partition inside the candidate frame).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAND_SCHEMA = "key string, mg_count long, part_rows long, part_ord long"


def _mg_partition(batches, key_name: str, m: int):
    """Misra-Gries over one partition's Arrow batches: ≤ m counters;
    on overflow decrement all (the classic amortized move). Emits the
    surviving counters plus the partition row count."""
    counters: dict = {}
    n = 0
    for pdf in batches:
        for k in pdf[key_name]:
            if k is None:
                continue
            n += 1
            if k in counters:
                counters[k] += 1
            elif len(counters) < m:
                counters[k] = 1
            else:
                dead = [c for c in counters if counters[c] == 1]
                for c in counters:
                    counters[c] -= 1
                for c in dead:
                    del counters[c]
    if n:
        # the marker row (key NULL, part_ord 1) carries part_rows into
        # the total exactly once per partition UNCONDITIONALLY: the MG
        # counter set can end EMPTY (a decrement cascade on all-distinct
        # tails — e.g. [a, b, c] with m=2), and hanging part_rows off a
        # counter row would then silently drop this partition's n,
        # undercounting the threshold bar (regression-tested)
        keys = list(counters)
        yield pd.DataFrame(
            {
                "key": keys + [None],
                "mg_count": [counters[k] for k in keys] + [0],
                "part_rows": [n] * (len(keys) + 1),
                "part_ord": [0] * len(keys) + [1],
            }
        )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: float,
    out_key: str = "key",
    out_count: str = "cnt",
) -> DataFrame:
    """All keys with count > ``threshold`` · n (NULL keys excluded,
    as GROUP BY would produce but a frequency query never wants),
    with their EXACT counts — deterministic under any partitioning.
    Returns columns ``(out_key string, out_count long)``.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    m = max(1, math.ceil(1.0 / threshold))
    keyed = df.select(F.col(key_col).cast("string").alias("__k"))
    cand = keyed.mapInPandas(
        lambda it: _mg_partition(it, "__k", m), schema=_CAND_SCHEMA
    )
    # cache: candidates feed BOTH the total-count reduce and the
    # recount semi-join; without it the MG scan runs twice
    cand = cand.localCheckpoint(eager=False)
    candidates = cand.filter(F.col("key").isNotNull()).select("key").distinct()
    totals = cand.select(
        F.sum(F.col("part_rows") * F.col("part_ord")).alias("n")
    )
    counts = (
        keyed.join(F.broadcast(candidates), keyed["__k"] == candidates["key"])
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") > F.lit(threshold) * F.col("n"))
        .select(
            F.col("key").alias(out_key), F.col("cnt").alias(out_count)
        )
    )
