"""Format-generic read/write surface (CSV, JSON-lines, ORC, raw text).

The bronze layer is parquet (sources/parquet.py, writers.py), but an
engine users switch to needs the interchange formats around it:
CSV/JSON for export-to-analysts and ingest-from-vendors, ORC for
foreign lakehouses, and raw text files as the entry point of a
training-data pipeline (one file = one document).

All readers take an explicit schema where the format cannot carry one
(CSV/JSON): schema inference is a full extra pass over the data at
100 TB and infers drifting types run-to-run — the engine treats it as
a bug, not a convenience (`infer=False` default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "csv", "json")


def write_format(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` at ``path`` in ``fmt``; CSV gets headers by default
    (the analyst-export convention)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", options.pop("header", "true"))
    for k, v in options.items():
        w = w.option(k, v)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. CSV/JSON require ``schema`` unless
    ``options['inferSchema']`` is explicitly passed — see module note."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", options.pop("header", "true"))
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json") and "inferSchema" not in options:
        raise ValueError(
            f"{fmt} read needs an explicit schema (inference is a full "
            "extra data pass and type-unstable at scale); pass schema= "
            "or inferSchema='true' to opt in deliberately"
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def read_text_corpus(
    spark: SparkSession, path: str, whole_files: bool = True
) -> DataFrame:
    """Raw text files -> (doc_id, text): the training-data ingest entry
    point. ``whole_files=True`` = one file is one document (wholetext,
    id = file path); ``False`` = one LINE is one document (the jsonl
    layout without the json), id = file path + md5 of the line + an
    occurrence index — a CONTENT key (a positional line number would
    depend on task split points; monotonically_increasing_id is
    partition-relative, the repo-wide determinism rule forbids it as
    an identity). Repeated identical lines in one file get distinct
    ids via the occurrence suffix; since the rows are byte-identical,
    which physical row gets which suffix is immaterial, and the id
    SET is deterministic.

    Scale note: wholetext cannot split a file across tasks — fine for
    document-sized files (the crawl-dump layout), wrong for one giant
    file; the line mode splits normally (the occurrence window
    shuffles on (file, line-hash) — duplicate-line groups only, never
    a global order).
    """
    if whole_files:
        # NB: must be the text(wholetext=) parameter — the PySpark
        # .text() reader overwrites a previously set "wholetext" option
        # with its own default
        return (
            spark.read.text(path, wholetext=True)
            .select(
                F.input_file_name().alias("doc_id"),
                F.col("value").alias("text"),
            )
        )
    from pyspark.sql import Window

    lines = spark.read.text(path).select(
        F.input_file_name().alias("_file"),
        F.md5(F.col("value")).alias("_h"),
        F.col("value").alias("text"),
    )
    occ = (
        F.row_number().over(
            Window.partitionBy("_file", "_h").orderBy(F.lit(1))
        )
        - 1
    )
    return lines.select(
        F.concat_ws("#", "_file", "_h", occ.cast("string")).alias(
            "doc_id"
        ),
        "text",
    )


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str,
    quarantine_dir: str | None = None,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Vendor-feed ingestion with corrupt-record QUARANTINE: read
    CSV/JSON in PERMISSIVE mode with an explicit ``_corrupt_record``
    column and split the result into ``(valid, corrupt)``.

    The production failure mode this exists for: one malformed line in
    a 100 TB vendor drop must neither kill the job (FAILFAST) nor
    silently vanish (DROPMALFORMED) — it lands in the quarantine frame
    with its raw bytes intact for replay after the upstream fix.
    ``quarantine_dir`` persists the corrupt rows immediately
    (append-mode parquet of (raw_record)); either way the corrupt
    frame is returned for counting/alerting.

    Spark caveat encoded here: since 2.3, filtering on the corrupt
    column alone of a lazily-parsed frame is disallowed — the parsed
    frame must be cached first, which also guarantees the
    valid/corrupt split reads the input once, not twice.
    """
    if fmt not in ("csv", "json"):
        raise ValueError("quarantine reads are for csv/json feeds")
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if "_corrupt_record" not in schema.fieldNames():
        from pyspark.sql.types import StringType, StructField

        schema = StructType(
            list(schema.fields) + [StructField("_corrupt_record", StringType())]
        )
    r = (
        spark.read.format(fmt)
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if fmt == "csv":
        r = r.option("header", options.pop("header", "true"))
    for k, v in options.items():
        r = r.option(k, v)
    parsed = r.load(path).cache()
    valid = parsed.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    corrupt = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_record")
    )
    if quarantine_dir is not None:
        corrupt.write.mode("append").parquet(quarantine_dir)
    return valid, corrupt
