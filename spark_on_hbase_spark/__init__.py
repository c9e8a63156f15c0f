"""spark_on_hbase_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of michal-harish/spark-on-hbase.

The reference (Scala / Spark 1.4 / HBase 1.1, see /root/reference) exposes HBase
tables as typed, partitioner-aware pair RDDs with server-side pushdown, single
stage lookup joins, rich mutation paths and a property-graph workload. This
package re-expresses that capability surface Spark-first:

- storage is keyed Parquet (salted multi-keyspace keys, range partitioned),
- scans/filters/projections are DataFrame ops (Catalyst does the pushdown the
  reference hand-rolls via HBase Filters),
- lookup joins become broadcast / AQE-planned joins,
- mutations (put/increment/delete/bulk*) become deterministic merge writes,
- the graph workload (AGraph/HGraphTable) becomes DataFrame ops over an
  exploded edge representation,
- streaming is Structured Streaming (readStream -> foreachBatch merge),
- plus the large-scale training-data operators the reference predates:
  dedup (exact/minhash-LSH/simhash/jaccard/embedding), similarity search,
  text analysis and multimodal column plumbing.

Everything is designed for a 1000-executor / 100 TB posture: no driver-side
collects inside operators, broadcast hints for dimension tables, map-side
partial aggregation, salted keys for uniform range partitioning.
"""

from spark_on_hbase_spark.matview import MaterializedAgg
from spark_on_hbase_spark.session import get_spark
from spark_on_hbase_spark.table import KeyedTable

__all__ = ["get_spark", "KeyedTable", "MaterializedAgg"]
__version__ = "0.1.0"
