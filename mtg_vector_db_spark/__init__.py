"""mtg_vector_db_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference system (``aayu3/mtg-vector-db``, a PostgreSQL+pgvector vector
database for Magic: The Gathering corpora) re-expressed Spark-first:

* documents + embeddings as Parquet-backed DataFrames (columnar, partitioned),
* exact cosine KNN via Catalyst-native expressions (TakeOrderedAndProject),
* threshold-filtered similarity search (``search_similar_*`` table-function
  analogs), two-stage retrieve-then-rerank, tiered fuzzy name resolution with
  pg_trgm-compatible trigram similarity, and multi-source fan-out search,
* plus the large-scale training-data-pipeline operators a 100 TB corpus needs:
  exact/MinHash-LSH/SimHash/embedding near-duplicate detection, ANN (IVF and
  LSH), language identification, quality scoring, tokenization statistics and
  document fingerprinting.

Design rules (see SURVEY.md):
  - DataFrame/SQL only in the hot path; Catalyst plans everything.
  - No Python row-at-a-time UDFs; higher-order functions or Arrow-batched
    pandas UDFs where Python is unavoidable.
  - Every operator must hold up at 1000-executor / 100 TB scale: broadcast
    small sides, shuffle only on declared keys, push filters to the scan.
"""

__version__ = "0.1.0"
