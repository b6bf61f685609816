"""End-to-end pipelines (the reference's operator entry points, Spark-first)."""
