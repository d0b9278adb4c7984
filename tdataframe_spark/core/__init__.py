from tdataframe_spark.core.frame import Frame, GroupedFrame
from tdataframe_spark.core.proxy import Engine, Result

__all__ = ["Frame", "GroupedFrame", "Engine", "Result"]
