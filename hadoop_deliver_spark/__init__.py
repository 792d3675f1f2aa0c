"""hadoop_deliver_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query / data-processing
capabilities of the ``chbrown/hadoop-deliver`` genre (HDFS batch
delivery pipelines), rebuilt on the PySpark DataFrame / SQL /
Structured Streaming stack, plus first-class LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis).

NOTE on provenance: the reference checkout at /root/reference/ is an
EMPTY directory (verified; see SURVEY.md §0), so no reference
file:line citations are possible anywhere in this package. The
binding spec is SURVEY.md §2's operator inventory and the driver
contract in __spark_entry__.py.

Layout:
    api.py        — THE COMPOSABLE PUBLIC SURFACE: column-parameterized
                    DataFrame→DataFrame cores (dedup, minhash pairs,
                    connected components, cosine pairs, exact global
                    ranking, as-of join, sessionize, LOCF grid, heavy
                    hitters, dataset split, tfidf, canonical URLs,
                    schema contract diff, avro read/write).
    session.py    — SparkSession factory tuned for local[32] dev and
                    cluster-scale defaults (AQE, shuffle partitions).
    tables.py     — fixture table loader (handles the events
                    nanosecond-timestamp parquet shim).
    registry.py   — the query registry: every operator from
                    SURVEY.md §2 registers (name, spark_fn, oracle_sql).
    operators/    — one module per SURVEY.md §2 section; fixture
                    bindings of the api.py cores where one exists.
"""

from hadoop_deliver_spark import api  # noqa: F401
from hadoop_deliver_spark.registry import REGISTRY, register  # noqa: F401
from hadoop_deliver_spark.session import get_spark  # noqa: F401
from hadoop_deliver_spark.tables import TABLES, prepare_session, tbl  # noqa: F401

__version__ = "0.1.0"
