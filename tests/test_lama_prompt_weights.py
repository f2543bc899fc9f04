"""Wide-relation-set prompt weighting: 15 LAMA relations through the
J1/J2/P1/A1-A4/W1 stage in one Spark run (dim-table width test)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.operators.prompt_weights import (
    compute_prompt_weights,
)
from knowledge_harvest_from_lms_spark.sources.relations import relations_from_json

LAMA = "/root/reference/relation_info/lama.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LAMA), reason="reference relation_info not mounted"
)


def test_lama_prompt_weights_wide(spark):
    rels_all = sorted(json.load(open(LAMA)))[:15]
    rels = relations_from_json(spark, LAMA).filter(F.col("rel").isin(rels_all))
    cfg = HarvestConfig(shuffle_partitions=8)
    pw = compute_prompt_weights(rels, cfg)
    rows = pw.collect()
    by_rel = {}
    for r in rows:
        by_rel.setdefault(r.rel, []).append(r.weight)
    assert len(by_rel) == 15
    for rel, ws in by_rel.items():
        assert len(ws) <= cfg.max_n_prompts
        assert sum(ws) == pytest.approx(1.0, abs=1e-6), rel
        assert all(w > cfg.weight_floor for w in ws)
