"""spark_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL pipeline (hyjae/spark-etl-pipeline, surveyed in SURVEY.md),
generalized into a reusable engine:

- ``session``     — SparkSession factory (modernizes reference
                    dependencies/spark.py:18-114).
- ``sources``     — parquet / JDBC / CSV / in-memory readers and the
                    parquet / JDBC / CSV sinks (reference jobs/etl_job.py
                    extract_data / extract_data_from_db / insert_data /
                    save_hdfs / write_data).
- ``functions``   — scalar-function layer: JSON, timestamp, string and
                    array helpers (reference §2.8 X1-X12).
- ``plans``       — query registry + the relational query suite + the
                    clickstream ETL pipeline re-expressed single-pass.
- ``operators``   — engine extensions: dedup (exact / MinHash-LSH /
                    SimHash / n-gram-Jaccard / fuzzy-levenshtein /
                    embedding-cosine), similarity search (brute-force /
                    hyperplane-LSH / IVF / k-means), text analysis,
                    training-data prep (split / decontaminate /
                    repetition filter / PII scrub / sequence packing /
                    weighted sampling), multimodal column plumbing,
                    data-quality profiling, as-of join, skew salting.
- ``streaming``   — Structured Streaming: tumbling / sliding / session
                    windows (batch-equivalent, oracle-checked), plus
                    applyInPandasWithState custom state and
                    dropDuplicatesWithinWatermark streaming dedup.
- ``config``      — reference-shaped JSON job config → FamilySpec model.
- ``logging``     — Log4j wrapper (reference dependencies/logging.py).

Everything is plain ``DataFrame -> DataFrame`` plan building; Catalyst is
the optimizer and executor. No RDD-level code.
"""

__version__ = "0.1.0"
