"""Spark-side operators (DataFrame API + Arrow-batched UDF stages)."""
