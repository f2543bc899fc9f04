"""Hearst-pattern IsA extraction (operators/hearst.py): the grammar
corners that decide whether web-scale pattern mining is trustworthy —
Oxford comma lists, single-item lists, and-other's reversed argument
order, self-pair filtering, multiplicity counting, and min_count.
Reference parity anchor: the reference mines IsA only through the MLM
(knowledge_harvest/lm.py); this operator is the corpus-grounded twin
feeding the same (hypo, hyper) shape as operators/corpus_grounding.py.
"""

from knowledge_harvest_from_lms_spark.operators.hearst import (
    hearst_isa,
    hearst_matches,
)


def _docs(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _triples(spark, *texts, **kw):
    rows = hearst_isa(_docs(spark, *texts), **kw).collect()
    return {(r.hypo, r.hyper, r.pattern): r.n for r in rows}


def test_such_as_plain_list(spark):
    got = _triples(spark, "fruits such as apples, pears and plums.")
    assert got == {
        ("apples", "fruits", "such_as"): 1,
        ("pears", "fruits", "such_as"): 1,
        ("plums", "fruits", "such_as"): 1,
    }


def test_such_as_oxford_comma(spark):
    # ", and plums" — the greedy-repeat corner the two-branch grammar
    # got wrong (captured "and" as an item); pinned here.
    got = _triples(spark, "fruits such as apples, pears, and plums.")
    assert got == {
        ("apples", "fruits", "such_as"): 1,
        ("pears", "fruits", "such_as"): 1,
        ("plums", "fruits", "such_as"): 1,
    }


def test_single_item_list(spark):
    got = _triples(spark, "metals such as iron are heavy.")
    assert got == {("iron", "metals", "such_as"): 1}


def test_and_other_reverses_roles(spark):
    got = _triples(spark, "iron, copper and other metals conduct.")
    assert got == {
        ("iron", "metals", "and_other"): 1,
        ("copper", "metals", "and_other"): 1,
    }


def test_and_other_oxford_comma(spark):
    got = _triples(spark, "iron, copper, and other metals conduct.")
    assert got == {
        ("iron", "metals", "and_other"): 1,
        ("copper", "metals", "and_other"): 1,
    }


def test_including_and_especially(spark):
    got = _triples(
        spark,
        "countries including france and spain. cities especially paris.",
    )
    assert got == {
        ("france", "countries", "including"): 1,
        ("spain", "countries", "including"): 1,
        ("paris", "cities", "especially"): 1,
    }


def test_self_pair_dropped(spark):
    # "things such as things" — the F7 intra-tuple dup filter.
    got = _triples(spark, "things such as things and stuff.")
    assert got == {("stuff", "things", "such_as"): 1}


def test_counts_aggregate_across_docs_and_min_count(spark):
    texts = [
        "fruits such as apples.",
        "fruits such as apples and pears.",
        "fruits such as apples.",
    ]
    got = _triples(spark, *texts)
    assert got[("apples", "fruits", "such_as")] == 3
    assert got[("pears", "fruits", "such_as")] == 1
    capped = _triples(spark, *texts, min_count=2)
    assert capped == {("apples", "fruits", "such_as"): 3}


def test_case_folded_and_no_match_is_empty(spark):
    got = _triples(spark, "Fruits SUCH AS Apples.", "no patterns here.")
    assert got == {("apples", "fruits", "such_as"): 1}
    assert _triples(spark, "plain text only.") == {}


def test_match_stream_keeps_list_string(spark):
    rows = hearst_matches(
        _docs(spark, "fruits such as apples, pears, and plums.")
    ).collect()
    assert len(rows) == 1
    assert rows[0].pattern == "such_as"
    assert rows[0].hyper == "fruits"
    assert rows[0].hypos == "apples, pears, and plums"


def test_multiple_matches_one_doc(spark):
    got = _triples(
        spark,
        "fruits such as apples. vegetables such as beets and kale.",
    )
    assert got == {
        ("apples", "fruits", "such_as"): 1,
        ("beets", "vegetables", "such_as"): 1,
        ("kale", "vegetables", "such_as"): 1,
    }


def test_copula_isa_all_tenses(spark):
    got = _triples(
        spark,
        "paris is a city. rome was a republic. "
        "whales are an oddity. dodos were a bird.",
    )
    assert got == {
        ("paris", "city", "copula_isa"): 1,
        ("rome", "republic", "copula_isa"): 1,
        ("whales", "oddity", "copula_isa"): 1,
        ("dodos", "bird", "copula_isa"): 1,
    }


def test_copula_chained_non_overlapping(spark):
    # leftmost non-overlapping scan: the shared middle token is
    # consumed by the first match — identical in Java and RE2.
    got = _triples(spark, "x is a y is a z.")
    assert got == {("x", "y", "copula_isa"): 1}


def test_appositive_requires_trailing_comma(spark):
    got = _triples(
        spark,
        "paris, a city, hosts it. rome, a republic once.",
    )
    # "rome, a republic once." has no closing comma -> no apposition
    assert got == {("paris", "city", "appositive_isa"): 1}


def test_oxford_and_glue_not_mistaken_for_article(spark):
    # ", and w" must never fire the appositive branch ("an" + "d"
    # fails the required space after the article).
    got = _triples(spark, "fruits such as apples, and pears.")
    assert got == {
        ("apples", "fruits", "such_as"): 1,
        ("pears", "fruits", "such_as"): 1,
    }


def _sibs(spark, *texts, **kw):
    from knowledge_harvest_from_lms_spark.operators.hearst import (
        hearst_siblings,
    )

    rows = hearst_siblings(_docs(spark, *texts), **kw).collect()
    return {(r.a, r.b, r.pattern): r.n for r in rows}


def test_siblings_all_pairs_normalized(spark):
    got = _sibs(spark, "fruits such as pears, apples, and plums.")
    # pairs canonicalized a < b regardless of list order
    assert got == {
        ("apples", "pears", "such_as"): 1,
        ("pears", "plums", "such_as"): 1,
        ("apples", "plums", "such_as"): 1,
    }


def test_siblings_duplicates_and_self_pairs(spark):
    # "x, x and y": (x,x) dropped, (x,y) counted per co-occurrence
    got = _sibs(spark, "things including x, x and y.")
    assert got == {("x", "y", "including"): 2}


def test_siblings_do_not_cross_lists(spark):
    got = _sibs(
        spark, "fruits such as apples. metals such as iron and zinc."
    )
    assert got == {("iron", "zinc", "such_as"): 1}
    # single-item and copula/appositive lists contribute nothing
    assert _sibs(spark, "paris is a city. rome, a republic, fell.") == {}


def test_siblings_min_count(spark):
    texts = ["t such as a and b.", "t such as a and b.", "t such as a and c."]
    assert _sibs(spark, *texts, min_count=2) == {("a", "b", "such_as"): 2}


def test_sightings_keep_provenance_columns(spark):
    from knowledge_harvest_from_lms_spark.operators.hearst import (
        hearst_isa_sightings,
    )

    docs = spark.createDataFrame(
        [
            ("u1", 100, "fruits such as apples and pears."),
            ("u2", 200, "fruits such as apples."),
        ],
        "url string, warc_ts long, text string",
    )
    rows = hearst_isa_sightings(docs, keep=("url", "warc_ts")).collect()
    got = {(r.url, r.warc_ts, r.hypo, r.hyper) for r in rows}
    assert got == {
        ("u1", 100, "apples", "fruits"),
        ("u1", 100, "pears", "fruits"),
        ("u2", 200, "apples", "fruits"),
    }
    # the aggregate view over the same stream equals hearst_isa
    agg = {
        (r.hypo, r.hyper, r.pattern): r.n
        for r in hearst_isa(docs).collect()
    }
    assert agg == {
        ("apples", "fruits", "such_as"): 2,
        ("pears", "fruits", "such_as"): 1,
    }
