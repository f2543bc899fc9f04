"""Branch-and-bound pruning (prune_slack) is a heuristic mirroring the
reference's heap threshold (the k-th word-cap-ACCEPTED score); on the
fixtures it must not change the final top-n."""

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.plans.harvest import harvest
from knowledge_harvest_from_lms_spark.sources.relations import fixture_relations


def test_pruned_equals_unpruned(spark):
    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    base = dict(max_n_ent_tuples=10, token_beam_width=6, max_ent_subwords=2,
                shuffle_partitions=8)
    t_exact = harvest(
        spark, rels, HarvestConfig(**base, prune_slack=None)
    )["triples"].collect()
    t_pruned = harvest(
        spark, rels, HarvestConfig(**base, prune_slack=3.0)
    )["triples"].collect()
    k_exact = sorted((r.rel, r.rank, tuple(r.ents)) for r in t_exact)
    k_pruned = sorted((r.rel, r.rank, tuple(r.ents)) for r in t_pruned)
    assert k_exact == k_pruned
