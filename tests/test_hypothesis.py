"""Ring-3b: randomized differential checks (hypothesis). Each example
is small (tens of rows) so the Spark jobs stay sub-second; examples are
bounded and deadline-free because JVM job latency is not the property
under test."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


def _pairs_brute(emb, tau):
    from hadoop_deliver_spark.operators.llm import _dot, _norm

    e = emb.withColumn("nrm", _norm("e"))
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= F.lit(tau))
        .select("vec_a", "vec_b", F.col("cos").cast("float").alias("cos"))
        .orderBy("vec_a", "vec_b")
        .collect()
    )


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    tau=st.sampled_from([0.2, 0.5, 0.8]),
    dim=st.sampled_from([4, 8]),
)
def test_grid_pairs_equal_brute_force_on_random_vectors(spark, seed, tau, dim):
    """The grid equi-join must equal brute-force all-pairs for ANY
    vector set and threshold — the lossless-partitioner claim, probed
    beyond the fixture corpus with random (clustered and unclustered)
    vectors."""
    import random

    from hadoop_deliver_spark.operators.llm_text import _grid_cosine_pairs

    rng = random.Random(seed)
    n = 24
    # half isotropic noise, half clustered around two centers — covers
    # both the degenerate-grid and the pruning-grid regimes
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(2)]
    rows = []
    for i in range(n):
        if i % 2 == 0:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        else:
            c = centers[i % len(centers)]
            v = [x + rng.gauss(0, 0.05) for x in c]
        if all(abs(x) < 1e-9 for x in v):
            v[0] = 1.0  # avoid zero vectors (undefined cosine)
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")
    grid = _grid_cosine_pairs(emb, tau=tau).collect()
    brute = _pairs_brute(emb, tau)
    assert grid == brute
