from dedup_spark.plans.pipeline import DedupResult, run_dedup

__all__ = ["DedupResult", "run_dedup"]
