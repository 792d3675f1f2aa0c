"""Query registry — the spine of the driver contract.

Every operator from SURVEY.md §2 registers exactly one named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (usually) a DuckDB
oracle SQL string. ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry.

Conventions (enforced by the parity tests):
  - every computed/aggregate column is aliased identically in the
    Spark query and the oracle SQL (the driver sorts columns by name
    before value-hashing);
  - float aggregates are rounded to 4 decimals on BOTH sides (double
    summation order differs between engines in the last ulp);
  - top-k queries carry a unique-key tiebreaker in the sort;
  - oracle omitted (None) ⇒ driver falls back to a rows-only check —
    reserved for genuinely engine-specific ops (sketches, RNG,
    partition-local semantics, stateful streaming).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: frozenset[str] = field(default_factory=frozenset)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=frozenset(tags),
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (triggers registration) and return
    the full registry."""
    import hadoop_deliver_spark.operators  # noqa: F401

    return REGISTRY
