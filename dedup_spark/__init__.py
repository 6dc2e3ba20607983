"""dedup_spark — a PySpark-native near-duplicate detection & clustering engine.

Generalizes the hash-and-group duplicate-finding dataflow of the reference
(samuelkai/Dedup, a single-threaded C++ file deduplicator — see
/root/reference/src/find_duplicates_map.cpp) to Common-Crawl-style web pages:

    scan → normalize → exact hash → [MinHash-LSH | SimHash | suffix-array]
         → Jaccard verify → connected components → representatives → sinks

Everything is declarative DataFrame + vectorized pandas/Arrow UDFs; no RDDs,
no per-row Python. Designed for 10^12-document scale: explicit partitioning,
broadcast of small sides, salted skew handling for hot LSH buckets, and
per-partition checkpoint/resume.
"""

from dedup_spark.config import DedupConfig

__version__ = "0.1.0"
__all__ = ["DedupConfig", "__version__"]
