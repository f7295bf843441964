"""arrow_supercluster_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of StoneTapeStudios/arrow-supercluster.

The reference (read-only at /root/reference) is an Arrow-native hierarchical
spatial point-clustering engine (Supercluster semantics: Web-Mercator
projection, per-zoom radius clustering, bbox cluster queries, drill-down).
This package re-expresses that capability surface — plus LLM-data-pipeline
extensions (dedup, similarity search, multimodal columns, text analysis) —
as idiomatic PySpark DataFrame pipelines designed for horizontal scale.

Design stance (SURVEY.md §7):
  * DataFrame/SQL expressions everywhere; Catalyst does the optimizing.
  * No RDDs. Pandas/Arrow kernels only where relationally inexpressible
    (the faithful greedy clustering kernel).
  * Every operator deterministic under repartitioning.
"""

from arrow_supercluster_spark.config import ClusterOptions

__version__ = "0.1.0"
__all__ = ["ClusterOptions", "__version__"]
