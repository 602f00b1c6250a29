"""JSONL document corpus source/sink — the LLM-pipeline interchange format.

Web-scale text corpora ship as line-delimited JSON (one document per
line: Common Crawl derivatives, RedPajama, Dolma all do). The reader
maps that onto the engine's ``documents`` schema with an EXPLICIT schema
(never inferSchema — a schema-inference pass over 100 TB is a full extra
scan) and PERMISSIVE corrupt-record capture, so one mangled line
quarantines instead of killing a 1000-executor job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: documents-table shape + the permissive-mode quarantine column.
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → (doc_id, lang, text) plus a ``_corrupt`` flag.

    Corrupt lines surface as rows with ``_corrupt=true`` and the raw
    line in ``corrupt_raw`` — callers decide whether to quarantine-write
    or fail; silently dropping them (DROPMALFORMED) loses data without a
    trace, the wrong default for a pipeline feeding training runs."""
    raw = (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return raw.select(
        "doc_id",
        "lang",
        "text",
        F.col("_corrupt_record").isNotNull().alias("_corrupt"),
        F.col("_corrupt_record").alias("corrupt_raw"),
    )


def clean_documents(parsed: DataFrame) -> DataFrame:
    """The good rows, in documents-table shape."""
    return parsed.filter(~F.col("_corrupt")).select("doc_id", "lang", "text")


def corrupt_documents(parsed: DataFrame) -> DataFrame:
    """The quarantine set: the raw line plus whatever fields half-parsed
    (doc_id is also load-bearing: Spark refuses scans whose referenced
    columns are ONLY the internal corrupt-record column —
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    return parsed.filter(F.col("_corrupt")).select("corrupt_raw", "doc_id")


def write_documents_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """documents-shaped DataFrame → JSONL files (optionally coalesced —
    interchange consumers usually want few large files)."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").json(path)
