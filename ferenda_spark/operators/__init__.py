"""Distributed operators: Arrow-UDF extraction stage, relate joins,
graph algorithms, dedup/similarity/text-stats for training-data
pipelines."""
