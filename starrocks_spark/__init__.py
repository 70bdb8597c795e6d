"""starrocks_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of StarRocks (reference: /root/reference).

Architecture: Spark SQL + Catalyst replaces the StarRocks FE (parser /
analyzer / CBO); Tungsten whole-stage-codegen execution replaces the BE
vectorized pipeline engine; Parquet tables replace native rowsets.
We implement the *semantic surface* — operator inventory, function
library, sketch/dedup/similarity extensions — declaratively so Catalyst
can optimize (predicate pushdown, column pruning, AQE, broadcast/skew
join selection) exactly as the reference's CBO would.
"""

from starrocks_spark.session import get_spark
from starrocks_spark.catalog import TABLES, register_tables

__all__ = ["get_spark", "register_tables", "TABLES"]
__version__ = "0.1.0"
