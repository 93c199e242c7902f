"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference customs-ETL pipeline
(``ming-goat/ETL-project-for-heavy-machinery-in-earthmoving-and-mobile-cranes``).

Everything is expressed Spark-first: declarative DataFrame / Spark SQL
plans optimized by Catalyst, broadcast joins for the small knowledge-base
dims, window-function winner selection for the fuzzy-match joins, and
closed-form expressions (no data-dependent driver loops) so every operator
scales to a multi-executor cluster.

Package layout
--------------
- ``session``    SparkSession factory + runtime tuning (ANSI off, AQE on)
- ``schemas``    explicit StructTypes for all tables
- ``sources``    parquet/csv readers, xlsx edge converter, literal dims
- ``functions``  pure Column-expression builders (text normalize, labels)
- ``operators``  the engine: fuzzy/regex/range joins, outliers, binning,
                 fx conversion, analysis aggregates, dedup, similarity,
                 text stats, multimodal plumbing, history maintenance
- ``plans``      end-to-end pipeline compositions (the reference notebook
                 re-expressed as one lazy DataFrame chain)
- ``streaming``  Structured Streaming jobs over the events table
"""

__version__ = "0.1.0"
