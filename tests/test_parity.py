"""Ring-2 parity: every registered query vs its DuckDB oracle at
sf0.001 — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from hadoop_deliver_spark.registry import load_all
from tests.parity import assert_frames_match

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    assert spdf.shape[0] >= 0  # query must at least execute
    if q.oracle is None:
        # rows-only: stable schema + executable is the contract
        assert len(sdf.columns) > 0
        return
    dpdf = duck.execute(q.oracle).df()
    assert_frames_match(spdf, dpdf, name)
