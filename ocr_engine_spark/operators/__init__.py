"""Spark operators: Arrow extraction stage, skew salting, audit/resume,
dedup, similarity search, text statistics."""
