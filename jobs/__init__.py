"""spark-submit job entry points (also importable for in-process tests)."""
