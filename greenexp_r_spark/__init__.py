"""greenexp_r_spark — a from-scratch PySpark-native greenness-exposure engine.

Re-expresses the capabilities of the GreenExp R package
(Spatial-Data-Science-and-GEO-AI-Lab/GreenExp_R, surveyed in SURVEY.md)
as distributed Spark DataFrame plans over a Common-Crawl-style pages
table, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    constants     — the deterministic synthetic world definition
    dialect       — Spark-SQL / DuckDB shared-SQL templater (oracle parity)
    session       — tuned SparkSession builder
    world         — world tables as Spark DataFrames *and* oracle SQL
    sources/      — pages/tiles readers & generators
    operators/    — the exposure + pipeline operators (SURVEY.md §2)
    kernels/      — numpy visibility kernels (viewshed / VGVI / raster math)
    plans/        — manifest checkpoint/lineage (resume support)
    streaming/    — Structured Streaming variants
"""

__version__ = "0.1.0"
