from tdataframe_spark.functions.vectors import cosine_similarity, dot, l2_norm
from tdataframe_spark.functions.numeric import dmean, dsum, portable_hash64

__all__ = ["cosine_similarity", "dot", "l2_norm", "dsum", "dmean", "portable_hash64"]
