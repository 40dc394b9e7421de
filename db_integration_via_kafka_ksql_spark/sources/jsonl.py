"""JSONL corpus ingestion: the interchange format LLM corpora actually
ship in (one JSON document per line), read with an EXPLICIT schema and
the same poison-record discipline as the CDC source (K5): malformed
lines are split into a dead-letter frame instead of silently nulling or
failing the job.

Spark's JSON reader is used in PERMISSIVE mode with
columnNameOfCorruptRecord, so a bad line yields one row whose corrupt
column holds the raw text and whose data columns are NULL — we split on
that marker. Schema is mandatory: schema inference reads the data twice
and locks in whatever the first sample implied, which is exactly the
silent-coercion failure the CDC side blocks too.

Scale: the JSON source splits by file and by line, predicate/column
pruning applies after parse; a corrupt-heavy input degrades to
dead-letter rows, never to task retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "__corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """(valid rows, dead letters) from a JSONL file/directory.

    A line is dead iff the parser could not bind it to the schema
    (malformed JSON, or a type mismatch on a schema column), OR any
    `required` column came out NULL — a parseable line that simply OMITS
    a field (renamed upstream, truncated export) binds as NULL in
    PERMISSIVE mode, which would otherwise be exactly the silent-NULL
    ingestion this reader exists to block. Dead rows carry (raw, reason)
    — the raw line (re-serialized from the bound columns for the
    missing-field case) for replay after a fix, mirroring
    `CdcPipeline.dead_letter`.
    """
    if any(f.name == _CORRUPT for f in schema.fields):
        raise ValueError(f"schema may not contain the reserved {_CORRUPT!r}")
    names = {f.name for f in schema.fields}
    missing = [c for c in required if c not in names]
    if missing:
        raise ValueError(f"required columns not in schema: {missing}")
    # StructType.add MUTATES the receiver — build a fresh StructType so a
    # caller-shared schema constant is never modified across calls
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    # the corrupt column is only populated on parse failure; cache the
    # split point so valid/dead don't re-parse the input separately
    raw = raw.localCheckpoint(eager=True)
    parsed = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    dead = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw"),
        F.lit("jsonl_parse_error").alias("reason"),
    )
    if required:
        null_req = None
        for c in required:
            e = F.col(c).isNull()
            null_req = e if null_req is None else (null_req | e)
        valid = parsed.filter(~null_req)
        dead = dead.unionByName(
            parsed.filter(null_req).select(
                F.to_json(F.struct(*[f.name for f in schema.fields])).alias(
                    "raw"
                ),
                F.lit("missing_required_field").alias("reason"),
            )
        )
    else:
        valid = parsed
    return valid, dead


def read_jsonl_documents(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """The documents-table contract over JSONL input: a row without a
    doc_id, text, or source is dead, not a NULL-bearing 'document'."""
    return read_jsonl(
        spark, path, DOCUMENTS_SCHEMA, required=("doc_id", "text", "source")
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    max_records_per_file: int | None = None,
) -> None:
    """Export a frame as JSONL — the interchange handoff to downstream
    tokenizer/trainer stacks that don't read parquet. gzip by default
    (splittable input isn't needed for an export artifact; size is);
    max_records_per_file bounds individual file size for uploaders.
    Round-trips through read_jsonl with the same schema (tested)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.json(path)
