"""Operator modules — one per SURVEY.md §2 section.

Importing this package registers every query into
``hadoop_deliver_spark.registry.REGISTRY``.
"""

from hadoop_deliver_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    analytics2,
    analytics3,
    arrowx,
    delivery_sync,
    dq,
    graph,
    llm_url,
    llm_vec,
    opsx,
    extras,
    extras2,
    fnx,
    functions,
    joins,
    llm,
    llm_contain,
    llm_ivf,
    llm_pipeline,
    llm_prep,
    llm_text,
    projections,
    scoring,
    setops,
    sketches,
    sorts,
    sources,
    sugar,
    surface2,
    sqlsurface,
    sqlx,
    streaming,
    timeseries,
    udfs,
    windows,
)
