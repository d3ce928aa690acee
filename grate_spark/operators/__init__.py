"""Spark-level operators: extraction UDTF, dedup, similarity, text."""
