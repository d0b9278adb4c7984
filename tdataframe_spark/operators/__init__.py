from tdataframe_spark.operators.asof import asof_join
from tdataframe_spark.operators.windows import sessionize, top_per_group

__all__ = ["asof_join", "sessionize", "top_per_group"]
