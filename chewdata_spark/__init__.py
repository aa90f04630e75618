"""chewdata_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference engine
``jmfiaschi/chewdata`` (a Rust async ETL tool) as an idiomatic PySpark
library:

- **Data model**: typed DataFrames with an optional ``_error: string``
  column replacing the reference's per-record ``DataResult::Ok|Err``
  channel (reference ``src/lib.rs:226-302``).  ``ok`` stream =
  ``_error IS NULL``; ``err`` stream = the complement.
- **Pipeline**: a JSON/YAML config of steps (reader / transformer /
  validator / writer / generator / eraser) compiles to a lazy DataFrame
  chain — Catalyst optimizes it; no hand-scheduled channels.
- **Operators beyond the reference**: joins, aggregations, windows, set
  ops, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), ANN
  similarity search, text analysis — everything a 100 TB training-data
  pipeline needs, expressed with built-in ``pyspark.sql.functions`` so
  the hot path stays inside whole-stage codegen.

Scale stance: declarative plans, broadcast hints for dimension tables,
AQE on, no driver-side ``collect()`` loops in any operator.
"""

from chewdata_spark.pipeline import Pipeline
from chewdata_spark.session import get_spark
from chewdata_spark.tables import TABLE_NAMES, load_table, load_tables

__version__ = "0.1.0"

__all__ = ["Pipeline", "get_spark", "load_table", "load_tables", "TABLE_NAMES", "__version__"]
