"""J6 corpus grounding of the beam vocabulary: with
ground_beam_to_corpus=True, every word of every harvested entity must
be attested in the web_pages corpus."""

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.lm import build_stub_lm
from knowledge_harvest_from_lms_spark.operators.corpus_grounding import (
    corpus_token_ids,
    tokenize_corpus,
)
from knowledge_harvest_from_lms_spark.plans.full_pipeline import run_full_pipeline
from knowledge_harvest_from_lms_spark.sources.relations import fixture_relations
from knowledge_harvest_from_lms_spark.sources.web_pages import synth_web_pages


def test_corpus_token_ids_semijoin(spark):
    pages = synth_web_pages(spark, 200, seed=42, n_partitions=2)
    lm = build_stub_lm()
    ids = corpus_token_ids(pages, lm)
    corpus_words = {
        r.word for r in tokenize_corpus(pages).select("word").distinct().collect()
    }
    assert ids, "synth corpus embeds fixture entity sentences"
    assert all(lm.token_text(i).lower() in corpus_words for i in ids)


def test_grounded_harvest_entities_attested(spark, tmp_path):
    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    pages = synth_web_pages(spark, 400, seed=42, n_partitions=4)
    cfg = HarvestConfig(
        max_n_ent_tuples=10, token_beam_width=6, max_ent_subwords=1,
        shuffle_partitions=8, ground_beam_to_corpus=True,
    )
    out = run_full_pipeline(spark, rels, pages, str(tmp_path), cfg)
    triples = out["triples"].collect()
    assert triples
    corpus_words = {
        r.word for r in tokenize_corpus(pages).select("word").distinct().collect()
    }
    for t in triples:
        for ent in t.ents:
            for w in ent.lower().split():
                assert w in corpus_words, (t.ents, w)
