"""N-Triples source (sources/ntriples.py): grammar coverage, the
order-correct escape chain, reject routing, and byte-exact
round-trips through serialize -> parse."""

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.sources.ntriples import (
    escape_literal,
    parse_ntriples,
    to_ntriples,
    unescape_literal,
)


def _parse(spark, *lines):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    return parse_ntriples(df).collect()


def test_parse_iri_triple(spark):
    (r,) = _parse(spark, "<http://a> <http://p> <http://b> .")
    assert r.valid
    assert (r.subj, r.pred, r.obj) == ("http://a", "http://p", "http://b")
    assert (r.subj_kind, r.obj_kind) == ("iri", "iri")
    assert r.lang is None and r.datatype is None


def test_parse_blank_nodes_and_whitespace(spark):
    (r,) = _parse(spark, "  _:b0\t<http://p>   _:b1  . ")
    assert r.valid
    assert (r.subj, r.obj) == ("_:b0", "_:b1")
    assert (r.subj_kind, r.obj_kind) == ("blank", "blank")


def test_parse_plain_lang_and_datatype_literals(spark):
    rows = _parse(
        spark,
        '<http://s> <http://p> "plain" .',
        '<http://s> <http://p> "hola"@es-MX .',
        '<http://s> <http://p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .',
    )
    assert [(r.obj, r.lang, r.datatype) for r in rows] == [
        ("plain", None, None),
        ("hola", "es-MX", None),
        ("42", None, "http://www.w3.org/2001/XMLSchema#int"),
    ]
    assert all(r.obj_kind == "literal" for r in rows)


def test_escape_chain_is_order_correct(spark):
    # the adversarial case for naive replace chains: an escaped
    # backslash FOLLOWED by 'n' must decode to backslash + n, never
    # to a newline.
    (r,) = _parse(spark, '<http://s> <http://p> "a\\\\nb" .')
    assert r.obj == "a\\nb"  # backslash, 'n' — NOT '\n'
    (r2,) = _parse(spark, '<http://s> <http://p> "a\\nb" .')
    assert r2.obj == "a\nb"  # real newline
    (r3,) = _parse(spark, '<http://s> <http://p> "q\\"t\\tu\\rv" .')
    assert r3.obj == 'q"t\tu\rv'


def test_comments_and_blank_lines_dropped_malformed_flagged(spark):
    rows = _parse(
        spark,
        "# a comment",
        "   ",
        "<http://s> <http://p> <http://o> .",
        "<http://s> not-an-iri <http://o> .",
        "<http://s> <http://p> missing-quotes .",
    )
    assert len(rows) == 3  # framing lines gone, bad lines kept
    by_line = {r.line: r for r in rows}
    good = by_line["<http://s> <http://p> <http://o> ."]
    assert good.valid and good.subj == "http://s"
    for bad_line in (
        "<http://s> not-an-iri <http://o> .",
        "<http://s> <http://p> missing-quotes .",
    ):
        bad = by_line[bad_line]
        assert not bad.valid
        assert bad.subj is None and bad.obj is None and bad.pred is None


def test_serialize_parse_round_trip_hostile_literals(spark):
    hostile = 'tab\t nl\n bs\\ q" mix\\n end'
    triples = spark.createDataFrame(
        [
            ("http://ex/a", "http://ex/p", hostile, "literal", None, None),
            ("http://ex/a", "http://ex/p", "val", "literal", "en", None),
            (
                "http://ex/a",
                "http://ex/p",
                "7",
                "literal",
                None,
                "http://ex/dt",
            ),
            ("_:b1", "http://ex/p", "http://ex/b", "iri", None, None),
            ("http://ex/a", "http://ex/p", "_:b2", "blank", None, None),
        ],
        "subj string, pred string, obj string, obj_kind string, "
        "lang string, datatype string",
    )
    parsed = parse_ntriples(to_ntriples(triples))
    got = {
        (r.subj, r.pred, r.obj, r.obj_kind, r.lang, r.datatype)
        for r in parsed.collect()
    }
    want = {tuple(t) for t in triples.collect()}
    assert got == want
    assert parsed.filter(~F.col("valid")).count() == 0


def test_serializer_emits_canonical_lines(spark):
    triples = spark.createDataFrame(
        [("http://a", "http://p", 'x"y', "literal", "en", None)],
        "subj string, pred string, obj string, obj_kind string, "
        "lang string, datatype string",
    )
    (line,) = [r.line for r in to_ntriples(triples).collect()]
    assert line == '<http://a> <http://p> "x\\"y"@en .'


def test_escape_unescape_column_inverses(spark):
    vals = ["", "\\", "\\\\n", '"\n\t\r"', "plain", "\\t literal"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    back = df.select(
        F.col("v"),
        unescape_literal(escape_literal(F.col("v"))).alias("rt"),
    )
    assert all(r.v == r.rt for r in back.collect())
