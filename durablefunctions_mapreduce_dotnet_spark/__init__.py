"""PySpark-native analytics engine with the query/data-processing
capabilities of Azure-Samples/durablefunctions-mapreduce-dotnet.

The reference (``/root/reference/ServerlessMapReduce/Sample.cs``) is a
serverless MapReduce computing average NYC yellow-taxi speed per day of
week.  This package re-expresses that computation — and a much wider
operator surface (joins, windows, set ops, dedup, similarity search,
text analysis, multimodal columns, streaming) — as idiomatic PySpark
DataFrame plans that Catalyst/Tungsten can optimize, designed for
1000-executor / 100 TB scale while testable on ``local[*]``.

Layout:
    session    — SparkSession builder with scale-sane defaults
    sources    — readers for parquet test tables and taxi-shaped CSV
    functions  — column-expression helpers (taxi semantics, exact sums,
                 text stats, vector math)
    operators  — the operator inventory (SURVEY.md §2) as DataFrame plans
    streaming  — Structured Streaming variants
    plans      — plan-inspection helpers (pushdown / codegen assertions)
"""

__version__ = "0.1.0"
