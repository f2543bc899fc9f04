"""Composed Gopher-style document quality gate.

Rae et al. 2021 (Gopher, table A1) drop web documents failing any of
a fixed rule set — word-count bounds, mean word length, symbol ratio,
alphabetic-word fraction, duplicate-line fractions, top/duplicated
n-gram character fractions. `gopher_quality_filter` evaluates the
whole rule set in ONE Arrow-batched mapInPandas pass per document:
the filter is row-local, so the 100 TB shape is a pure map over
(id, text) with ZERO shuffle and no join-back — the verdict, the
per-rule reasons, and the underlying signals come out together.
(Computing the signals through the individual operators —
`line_repetition_columns`, `ngram_repetition_stats` — and joining
would shuffle the stats table against its own parent for no reason;
those operators stay the right tool when you want ONE signal or its
oracle query.)

Signal semantics match the oracle-checked operators in
`textstats.py` exactly (same split, same char accounting, same
tie-breaks); `tests/test_quality_filter.py` pins the consistency on
random documents. Thresholds default to Gopher's published values;
pass `thresholds={...}` to override any subset. A rule whose
threshold is ``None`` is skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Gopher table A1 defaults. Key -> (default, "which direction fails").
GOPHER_DEFAULTS: dict[str, float | None] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,          # '#' or '...' per word
    "min_alpha_word_frac": 0.80,      # words containing >=1 alphabetic char
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_dup_para_frac": 0.30,
    "max_dup_para_char_frac": 0.20,
    "max_top_2gram_char_frac": 0.20,
    "max_top_3gram_char_frac": 0.18,
    "max_top_4gram_char_frac": 0.16,
    "max_dup_5gram_frac": 0.15,       # position-based (textstats note)
    "max_dup_10gram_frac": 0.10,
}

_STAT_FIELDS = [
    ("n_words", T.LongType()),
    ("mean_word_len", T.DoubleType()),
    ("symbol_ratio", T.DoubleType()),
    ("alpha_word_frac", T.DoubleType()),
    ("dup_line_frac", T.DoubleType()),
    ("dup_line_char_frac", T.DoubleType()),
    ("dup_para_frac", T.DoubleType()),
    ("dup_para_char_frac", T.DoubleType()),
    ("top_2gram_char_frac", T.DoubleType()),
    ("top_3gram_char_frac", T.DoubleType()),
    ("top_4gram_char_frac", T.DoubleType()),
    ("dup_5gram_frac", T.DoubleType()),
    ("dup_10gram_frac", T.DoubleType()),
]


def _doc_signals(text: str) -> dict[str, float]:
    """All quality signals for one document — plain Python, shared by
    the Spark path and the tests' independent expectations."""
    from collections import Counter

    text = text or ""  # NULL text -> empty: the gate must be total
    words = text.split(" ")
    n_words = len(words)
    tchars = len(text) - (n_words - 1)
    out: dict[str, float] = {"n_words": n_words}
    out["mean_word_len"] = (
        sum(len(w) for w in words) / n_words if n_words else 0.0
    )
    out["symbol_ratio"] = (
        (text.count("#") + text.count("...")) / n_words if n_words else 0.0
    )
    out["alpha_word_frac"] = (
        sum(1 for w in words if any(c.isalpha() for c in w)) / n_words
        if n_words
        else 0.0
    )
    # strip(" ") not strip(): the textstats unit kernel blanks units
    # with F.trim, which removes ASCII SPACES only — a tab-only line
    # counts as non-blank in both paths or the documented consistency
    # between the two operators breaks
    for sep, prefix in (("\n", "line"), ("\n\n", "para")):
        units = [u for u in text.split(sep) if u.strip(" ")]
        if units:
            counts = Counter(units)
            dups = [u for u in units if counts[u] > 1]
            out[f"dup_{prefix}_frac"] = len(dups) / len(units)
            uchars = sum(len(u) for u in units)
            out[f"dup_{prefix}_char_frac"] = (
                sum(len(u) for u in dups) / uchars if uchars else 0.0
            )
        else:
            out[f"dup_{prefix}_frac"] = 0.0
            out[f"dup_{prefix}_char_frac"] = 0.0
    for n in (2, 3, 4):
        key = f"top_{n}gram_char_frac"
        if n_words < n or tchars <= 0:
            out[key] = 0.0
            continue
        counts = Counter(
            " ".join(words[i : i + n]) for i in range(n_words - n + 1)
        )
        top, cnt = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        out[key] = cnt * (len(top) - (n - 1)) / tchars
    for n in (5, 10):
        key = f"dup_{n}gram_frac"
        if n_words < n:
            out[key] = 0.0
            continue
        counts = Counter(
            " ".join(words[i : i + n]) for i in range(n_words - n + 1)
        )
        total = n_words - n + 1
        dup = sum(v for v in counts.values() if v > 1)
        out[key] = dup / total
    return out


def _failed_rules(sig: dict[str, float], th: dict[str, float | None]) -> list[str]:
    fails: list[str] = []

    def chk(rule: str, sig_key: str, below: bool = False) -> None:
        # threshold fetched FIRST: a None (disabled) rule must never
        # evaluate its comparison
        bound = th.get(rule)
        if bound is None:
            return
        val = sig[sig_key]
        if (val < bound) if below else (val > bound):
            fails.append(rule)

    chk("min_words", "n_words", below=True)
    chk("max_words", "n_words")
    chk("min_mean_word_len", "mean_word_len", below=True)
    chk("max_mean_word_len", "mean_word_len")
    chk("max_symbol_ratio", "symbol_ratio")
    chk("min_alpha_word_frac", "alpha_word_frac", below=True)
    for rule in (
        "max_dup_line_frac",
        "max_dup_line_char_frac",
        "max_dup_para_frac",
        "max_dup_para_char_frac",
        "max_top_2gram_char_frac",
        "max_top_3gram_char_frac",
        "max_top_4gram_char_frac",
        "max_dup_5gram_frac",
        "max_dup_10gram_frac",
    ):
        chk(rule, rule[4:])  # strip "max_"
    return fails


def gopher_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float | None] | None = None,
    keep_only: bool = False,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Evaluate the Gopher rule set per document (module docstring).

    Returns (id, keep, failed_rules, <13 signal columns>,
    *passthrough); with ``keep_only=True`` the dropped rows are
    filtered out and only (id, keep) semantics matter — the signals
    still ride along for downstream auditing. ``passthrough`` columns
    (which may include ``text_col``) are echoed through the Arrow
    batch so a filter stage needs NO join-back against its input.
    Signals are raw doubles (UN-rounded: they feed threshold
    comparisons, not an equality oracle).
    """
    import pandas as pd

    th = dict(GOPHER_DEFAULTS)
    th.update(thresholds or {})
    unknown = set(th) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown quality rules: {sorted(unknown)}")

    passthrough = tuple(c for c in passthrough if c != id_col)
    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("keep", T.BooleanType()),
            T.StructField("failed_rules", T.ArrayType(T.StringType())),
        ]
        + [T.StructField(name, dt) for name, dt in _STAT_FIELDS]
        + [df.schema[c] for c in passthrough]
    )
    stat_names = [name for name, _ in _STAT_FIELDS]
    in_cols = [id_col, text_col] + [c for c in passthrough if c != text_col]

    def gen(batches):
        for pdf in batches:
            cols: dict[str, list] = {
                id_col: [], "keep": [], "failed_rules": [],
                **{k: [] for k in stat_names},
                **{c: [] for c in passthrough},
            }
            # positional zip, not itertuples: pandas mangles column
            # names that aren't valid identifiers
            for vals in zip(*(pdf[c] for c in in_cols)):
                rec = dict(zip(in_cols, vals))
                sig = _doc_signals(rec[text_col])
                fails = _failed_rules(sig, th)
                if keep_only and fails:
                    continue
                cols[id_col].append(rec[id_col])
                cols["keep"].append(not fails)
                cols["failed_rules"].append(fails)
                for k in stat_names:
                    cols[k].append(sig[k])
                for c in passthrough:
                    cols[c].append(rec[c])
            pdf_out = pd.DataFrame(cols)
            # an all-filtered batch yields an EMPTY frame whose
            # columns default to float64 — pin the list column to
            # object or Arrow refuses the list<string> conversion
            pdf_out["failed_rules"] = pdf_out["failed_rules"].astype(object)
            yield pdf_out

    return df.select(*in_cols).mapInPandas(gen, schema)
