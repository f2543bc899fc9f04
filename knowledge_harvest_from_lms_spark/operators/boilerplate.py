"""Host-level boilerplate line removal (the CCNet / BTE line-
frequency technique): a line that appears on more than ``max_frac``
of a host's pages (navigation, cookie banners, footers) is site
furniture, not content — remove it from every page of that host.
This completes the line-level hygiene triad: per-document dup-line
signals (`textstats`), corpus-wide paragraph dedup (`dedup`), and
per-HOST frequency-based boilerplate (here) each catch a different
duplication structure.

NOTE on composition: this operator needs line-PRESERVING text.
`operators/extract_text.py` deliberately collapses all whitespace to
single spaces (byte-identity contract with the reference), so its
output carries no newlines — run boilerplate removal on a
line-preserving extraction (or raw text) BEFORE such a collapse, not
after; it is intentionally not wired into the pipeline's 15_clean
stage for exactly this reason.

Scale shape: line frequencies are a two-phase aggregate on
(host, line) with countDistinct(page) — partial aggregation absorbs
the hot keys (a chain's shared footer across 10^6 pages of one
host). The boilerplate set is host-local and tiny relative to the
corpus but NOT globally broadcastable (it scales with host count),
so removal is a shuffle LEFT ANTI join on (host, line) — probe-side
hot lines are precisely what AQE's skew-join splits, and the build
side has one row per (host, line). Reassembly is one groupBy on the
uniform page id, plus an ids-only row-preserving left join (a page
that was ALL boilerplate stays a row with empty text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_lines(
    pages: DataFrame,
    host_col: str = "host",
    id_col: str = "url",
    text_col: str = "text",
    min_pages: int = 2,
    max_frac: float = 0.5,
) -> DataFrame:
    """(host, line, n_pages_with_line, host_pages, frac) for every
    line exceeding the boilerplate frequency bound: present on at
    least ``min_pages`` pages AND on more than ``max_frac`` of the
    host's pages. A line repeated within ONE page counts once
    (countDistinct id), so in-page repetition cannot fake site-wide
    frequency."""
    if not 0 < max_frac <= 1:
        raise ValueError(f"max_frac must be in (0, 1], got {max_frac}")
    h, i = F.col(host_col), F.col(id_col)
    lines = pages.select(
        h,
        i,
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "line"
        ),
    ).filter(F.length(F.trim(F.col("line"))) > 0)
    per_line = lines.groupBy(host_col, "line").agg(
        F.countDistinct(id_col).alias("n_pages_with_line")
    )
    per_host = pages.groupBy(host_col).agg(
        F.countDistinct(id_col).alias("host_pages")
    )
    return (
        per_line.join(per_host, host_col)
        .withColumn(
            "frac",
            F.round(F.col("n_pages_with_line") / F.col("host_pages"), 6),
        )
        .filter(
            (F.col("n_pages_with_line") >= min_pages)
            & (F.col("frac") > max_frac)
        )
    )


def remove_boilerplate_lines(
    pages: DataFrame,
    host_col: str = "host",
    id_col: str = "url",
    text_col: str = "text",
    min_pages: int = 2,
    max_frac: float = 0.5,
) -> DataFrame:
    """Strip each host's boilerplate lines from its pages; returns
    (host, id, text, n_lines_kept) with text rebuilt from the
    surviving non-blank lines in original order ('' when everything
    was boilerplate — row preserved). Blank lines do not survive
    reassembly (documented; they carry no content)."""
    bp = boilerplate_lines(
        pages, host_col, id_col, text_col, min_pages, max_frac
    ).select(host_col, "line")
    h, i = F.col(host_col), F.col(id_col)
    lines = pages.select(
        h,
        i,
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).filter(F.length(F.trim(F.col("line"))) > 0)
    kept = lines.join(bp, [host_col, "line"], "left_anti")
    rebuilt = kept.groupBy(host_col, id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_text"),
    )
    return (
        pages.select(h, i)
        .join(rebuilt, [host_col, id_col], "left")
        .select(
            h,
            i,
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_lines_kept"), F.lit(0))
            .cast("bigint")
            .alias("n_lines_kept"),
        )
    )
