"""ig_etl_with_user_reports_2024_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and data-processing
capabilities of the reference repo ``khemale3x3/IG-ETL-with-User-Reports-2024``
(an Instagram UGC-creator ETL: scrape → analyze → wide-CSV report), designed
for 100 TB scale:

- declarative DataFrame/SQL plans (Catalyst picks the physical strategy),
- one shuffle per creator-grain aggregation (the reference re-scans each
  creator's post list ~10×; here it is a single ``groupBy``),
- broadcast joins for every dimension (cities, keywords, pricing),
- explicit position columns for the reference's arrival-order semantics
  (SURVEY.md Q9/Q10),
- a pinned ``as_of`` timestamp instead of wall-clock ``now()`` (Q8).

Layout:
    session.py    SparkSession factory tuned for local testing / cluster scale
    config.py     pinned as-of timestamps and engine constants
    schemas.py    explicit StructTypes for the reference-shaped data model
    dims.py       literal dimension tables (keywords, pricing, stopwords, cities)
    sources/      readers: parquet/CSV/JSON doc scan, work-queue anti-join
    functions/    scalar column helpers (ER formulas, text extraction, dates)
    operators/    relational operators: aggregates, windows, classifiers,
                  dedup, similarity search, text analysis, multimodal stubs
    plans/        end-to-end assembled pipelines (creator report, wide CSV)
    streaming/    Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
