from starrocks_spark.operators.asof_join import asof_join
from starrocks_spark.operators.sessionize import sessionize
from starrocks_spark.operators.funnel import window_funnel
from starrocks_spark.operators.retention import retention

__all__ = ["asof_join", "sessionize", "window_funnel", "retention"]
