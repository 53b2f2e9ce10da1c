"""terminus_server_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of terminusdb/terminus-server.

Design: the reference is a Prolog/Rust triple-store with a datalog
query language (WOQL), a JSON document layer, and git-like layer
versioning.  Here every capability is re-expressed Spark-first:

- triples are a predicate-partitionable DataFrame (``model.triples``);
- WOQL compiles to DataFrame plans that Catalyst optimizes
  (``woql``);
- layers/commits are add/remove delta DataFrames (``versioning``);
- path regexes are semi-naive iterative joins (``operators.path``);
- graph analytics, dedup, ANN, and text pipelines are DataFrame
  operators (``operators``).
"""

from terminus_server_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
