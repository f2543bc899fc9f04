"""Benchmark decontamination (the GPT-3 appendix-C move): flag or
drop training documents sharing any word n-gram (n=13 by default)
with an evaluation benchmark, so test-set text never leaks into the
corpus.

Shape: the benchmark is the SMALL side (an eval set, not a corpus) —
its distinct grams build once; the corpus side generates grams in the
projection (zip of n shifted array slices — JVM, no Python) and
probes via an equi-join. With ``hash_grams=True`` (default) both
sides join on ``xxhash64(gram)`` instead of the gram string: 8 bytes
a key keeps a multi-million-gram benchmark broadcastable (~80 MB at
10M grams vs ~1 GB of 13-gram strings), at the cost of a vanishing
false-flag probability (a 64-bit collision marks an innocent doc —
acceptable for a DROP filter, never used to keep anything).
``hash_grams=False`` joins on the strings themselves — exact, and
DuckDB-replayable (q53's oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text: Column, n: int) -> Column:
    """Array of word n-grams — n-1 chained zip_withs over shifted
    slices of the split array: O(n) array ops per row, not per gram,
    all JVM-side."""
    w = F.split(text, " ")
    if n == 1:
        return w
    cnt = F.size(w) - (n - 1)
    arr = F.slice(w, 1, cnt)
    for k in range(2, n + 1):
        arr = F.zip_with(
            arr, F.slice(w, k, cnt), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(F.size(w) >= n, arr).otherwise(
        F.array().cast("array<string>")
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    hash_grams: bool = True,
) -> DataFrame:
    """(id, n_contaminated_grams) for every document sharing at least
    one word n-gram with the benchmark."""
    bench = (
        benchmark.select(
            F.explode(word_ngrams(F.col(bench_text_col), n)).alias("gram")
        )
        .distinct()
    )
    probe = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    if hash_grams:
        bench = bench.select(F.xxhash64("gram").alias("k"))
        probe = probe.select(id_col, F.xxhash64("gram").alias("k"))
        key = "k"
    else:
        key = "gram"
    return (
        probe.join(F.broadcast(bench), key)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated_grams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    hash_grams: bool = True,
) -> DataFrame:
    """Drop every document sharing any word n-gram with the
    benchmark (anti-join against the hit set)."""
    hits = contamination_hits(
        docs, benchmark, id_col, text_col, bench_text_col, n, hash_grams
    )
    return docs.join(hits.select(id_col), id_col, "left_anti")
