"""JSONL (newline-delimited JSON) source + sink.

The interchange format every LLM-data stack speaks (HF datasets,
Dolma, RedPajama releases ship as .jsonl.gz shards).  Built on
Spark's native json reader/writer — JVM-side parsing, no Python in
the row path.

Scale notes (the parts that matter at 100 TB):

  * READ with an EXPLICIT schema, always: schema inference is a
    full extra pass over the data and silently widens types on
    dirty corpora.  ``read_jsonl`` therefore requires one.
  * gzip shards are NOT splittable — one file = one task, so the
    writer controls read parallelism via ``n_files``.  Keep shards
    ~100-500 MB; for splittable compression emit zstd/bzip2 or
    uncompressed (parameterized here).
  * corrupt lines: PERMISSIVE mode + ``columnNameOfCorruptRecord``
    surfaces bad lines as rows with ``_corrupt`` set instead of
    killing a 10^12-line job; ``bad_line_count`` gives the audit
    number.

Reference parity note: TildeNER's corpus interchange is one-doc-per
-file plaintext (ProcessDirectory.pl:28-40); JSONL is the web-scale
replacement with the same role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCUMENTS_SCHEMA = ("doc_id bigint, text string, lang string, "
                    "source string, n_chars bigint")


def write_jsonl(df: DataFrame, path: str, n_files: int = 16,
                compression: str = "gzip") -> None:
    """Write ``df`` as ``n_files`` JSONL shards (one JSON object per
    line, UTF-8)."""
    (df.repartition(n_files)
       .write.mode("overwrite")
       .option("compression", compression)
       .json(path))


def read_jsonl(spark: SparkSession, path: str,
               schema: str) -> DataFrame:
    """Read JSONL with an explicit schema; corrupt lines surface in
    the ``_corrupt`` column (null for good rows)."""
    return (spark.read
            .schema(schema + ", _corrupt string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(path))


def bad_line_count(df: DataFrame) -> int:
    """Number of corrupt input lines in a read_jsonl frame.

    The aggregate also touches a real column: Spark refuses plans
    that scan ONLY the internal corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) because the json reader
    cannot prune to it."""
    real = [c for c in df.columns if c != "_corrupt"][0]
    row = df.agg(
        F.sum(F.col("_corrupt").isNotNull().cast("long")).alias("bad"),
        F.count(F.col(real)).alias("_touch")).collect()[0]
    return int(row["bad"] or 0)
