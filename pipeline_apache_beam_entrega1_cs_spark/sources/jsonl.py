"""Tolerant JSON-Lines source.

Replicates the reference's ``ParseJson`` rule (reference
src/pipeline.py:136-144): ``json.loads`` each line, keep only results that
are dicts, silently drop anything else (malformed JSON, scalars, arrays,
JSON ``null``).

Spark-first translation: ``from_json`` alone cannot express "dict-only" —
in PERMISSIVE mode it returns an all-null struct for BOTH ``{}`` (a dict,
must be kept) and ``null``/``[1,2]``/garbage (must be dropped); verified
empirically on PySpark 4.1. We therefore gate on the Variant parser:
``try_parse_json`` returns NULL for malformed input, and
``schema_of_variant`` starts with ``OBJECT`` exactly when the value is a
JSON object. All native expressions — the scan + parse + filter is one
narrow whole-stage-codegen pass, no Python involved.

Scale note: the glob can span millions of files; the schema is explicit so
no inference pass runs over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_object_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """Filter a text DataFrame down to lines that parse as JSON objects."""
    v = F.try_parse_json(F.col(col))
    return lines.filter(v.isNotNull() & F.startswith(F.schema_of_variant(v), F.lit("OBJECT")))


def parse_jsonl_dicts(
    lines: DataFrame, schema: T.StructType, keys_col: str | None = None
) -> DataFrame:
    """Apply the dict-only rule + schema projection to a text DataFrame
    (batch or streaming — the expressions are identical).

    ``keys_col`` optionally attaches the object's top-level key list
    (native ``json_object_keys``): ``from_json`` collapses an ABSENT key
    and an explicit JSON ``null`` into the same struct-field null, but
    reference semantics can differ between the two (dict.get default vs
    a stored None) — the key list lets downstream operators tell them
    apart."""
    kept = json_object_lines(lines)
    extras = [F.json_object_keys(F.col("value")).alias(keys_col)] if keys_col else []
    rec = kept.select(F.from_json(F.col("value"), schema).alias("rec"), *extras)
    return rec.select("rec.*", *([keys_col] if keys_col else []))


def read_jsonl_dicts(
    spark: SparkSession, path_glob: str, schema: T.StructType, keys_col: str | None = None
) -> DataFrame:
    """Read newline-delimited JSON keeping only well-formed JSON objects,
    projected through an explicit schema (missing fields -> null, exactly
    like ``dict.get`` in the reference's downstream operators)."""
    return parse_jsonl_dicts(spark.read.text(path_glob), schema, keys_col)


def stream_jsonl_dicts(
    spark: SparkSession, path_glob: str, schema: T.StructType, keys_col: str | None = None
) -> DataFrame:
    """Streaming twin of read_jsonl_dicts (file-source text stream)."""
    return parse_jsonl_dicts(spark.readStream.text(path_glob), schema, keys_col)
