"""The fidelity pipeline: reproduces the reference's single dataflow
(reference src/pipeline.py:279-296) as native Spark —

    read text glob -> json-object filter -> DeviceType filter ->
    RaceID normalization -> broadcast country enrichment ->
    KEEP projection -> JSONL sink

Zero Python UDFs: every transform is a Catalyst expression, so the whole
chain is ONE narrow stage under whole-stage codegen (the Spark analog of
Beam DirectRunner's ParDo fusion), and the enrichment join is a broadcast
hash join (the analog of the reference's pickled driver-dict lookup,
reference src/pipeline.py:275,288).

Fidelity traps replicated (SURVEY.md §7 known-hard list):
- missing/null DeviceType is KEPT (``str(None)``/"" != "Other");
- padded " Other " is dropped (``.strip()`` before compare);
- UK/USA facts alias-rewrite to long names, MISS the LUT (which back-fills
  aliases canonical-only) and get the fallback struct -> 28 golden rows;
- ``LocationData`` has a field literally named "official language";
- ``Timestamp`` stays an opaque string.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import apply_country_alias, norm_country_key, standardize_race_id
from ..schemas import FAN_ENGAGEMENT_SCHEMA, KEEP, LOCATION_FIELDS
from ..sources.csv_tolerant import read_country_dim
from ..sources.jsonl import read_jsonl_dicts


def filter_device_other(df: DataFrame) -> DataFrame:
    """Drop rows whose trimmed DeviceType equals "Other" (reference
    src/pipeline.py:147-151). Null-safe: a bare ``!=`` would silently drop
    null DeviceType rows under SQL three-valued logic, but the reference
    KEEPS them — hence the coalesce."""
    return df.filter(F.trim(F.coalesce(F.col("DeviceType"), F.lit(""))) != "Other")


JSON_KEYS_COL = "_json_keys"


def standardize_race(df: DataFrame) -> DataFrame:
    """Normalize RaceID (reference src/pipeline.py:154-159).

    Reference semantics are three-way: an ABSENT key defaults to "" via
    ``row.get("RaceID", "")`` (normalizes to ""), but an explicit JSON
    ``null`` is returned UNCHANGED by standardize_race_id's
    ``isinstance(str)`` guard (src/pipeline.py:28-30). When the source
    carried the raw key list we can replicate both; otherwise (column
    fed directly, e.g. in unit tests) null is indistinguishable from
    absent and gets the dict.get default."""
    if JSON_KEYS_COL in df.columns:
        return df.withColumn(
            "RaceID",
            F.when(~F.array_contains(F.col(JSON_KEYS_COL), "RaceID"), F.lit(""))
            .when(F.col("RaceID").isNull(), F.lit(None).cast("string"))
            .otherwise(standardize_race_id(F.col("RaceID"))),
        )
    return df.withColumn(
        "RaceID", standardize_race_id(F.coalesce(F.col("RaceID"), F.lit("")))
    )


def enrich_with_country(df: DataFrame, country_dim: DataFrame) -> DataFrame:
    """Broadcast left join against the country dimension + fallback struct
    (reference src/pipeline.py:162-182). The fact-side key is normalized
    then alias-rewritten BEFORE lookup (reference :170-171)."""
    key = apply_country_alias(norm_country_key(F.col("ViewerLocationCountry")))
    fact = df.withColumn("_ckey", key)

    dim = country_dim.select(
        F.col("key").alias("_dimkey"),
        F.struct(*[F.col(f"`{f}`") for f in LOCATION_FIELDS]).alias("_loc"),
    )

    joined = fact.join(F.broadcast(dim), fact._ckey == dim._dimkey, "left")

    fallback = F.struct(
        F.trim(F.coalesce(F.col("ViewerLocationCountry"), F.lit(""))).alias("country"),
        F.lit("").alias("capital"),
        F.lit("").alias("continent"),
        F.lit("").alias("official language"),
        F.lit("").alias("currency"),
    )
    # The reference also falls back when the payload dict is falsy; a
    # matched payload is never falsy here (struct of 5 strings), so
    # isNull() is the exact condition.
    return (
        joined.withColumn(
            "LocationData",
            F.when(F.col("_dimkey").isNull(), fallback).otherwise(F.col("_loc")),
        )
        .drop("_ckey", "_dimkey", "_loc", "ViewerLocationCountry")
    )


def project_output(df: DataFrame) -> DataFrame:
    """Keep exactly the 8 KEEP fields in order (reference
    src/pipeline.py:185-200)."""
    return df.select(*KEEP)


def _transforms(events: DataFrame, country_dim: DataFrame) -> DataFrame:
    return project_output(
        enrich_with_country(standardize_race(filter_device_other(events)), country_dim)
    )


def build_fidelity_df(spark: SparkSession, json_glob: str, csv_path: str) -> DataFrame:
    """Assemble the full lazy plan (the analog of the reference's Beam
    graph construction at src/pipeline.py:279-296)."""
    events = read_jsonl_dicts(spark, json_glob, FAN_ENGAGEMENT_SCHEMA, keys_col=JSON_KEYS_COL)
    return _transforms(events, read_country_dim(spark, csv_path))


def build_fidelity_stream(spark: SparkSession, json_glob: str, csv_path: str) -> DataFrame:
    """The same pipeline under Structured Streaming: a text file-source
    stream through the identical transform chain (all narrow + a
    stream-static broadcast join — legal in append mode with no
    aggregation). One pipeline definition, two execution modes — the
    declarative-plan payoff the reference's DoFn chain can't offer."""
    from ..sources.jsonl import stream_jsonl_dicts

    events = stream_jsonl_dicts(spark, json_glob, FAN_ENGAGEMENT_SCHEMA, keys_col=JSON_KEYS_COL)
    # Streaming plans reject monotonically_increasing_id even on the
    # static join side — materialize the (tiny, by definition) dimension
    # driver-side, the same eager-LUT shape the reference uses.
    lazy_dim = read_country_dim(spark, csv_path)
    country_dim = spark.createDataFrame(lazy_dim.collect(), lazy_dim.schema)
    return _transforms(events, country_dim)


def write_jsonl(df: DataFrame, out_dir: str, single_shard: bool = True,
                prefix: str | None = None) -> None:
    """JSONL sink. ``single_shard`` replicates the reference's
    ``num_shards=1`` (src/pipeline.py:296) — an explicit anti-scale choice
    kept only for golden fidelity; at scale leave sharding to Spark.

    With ``prefix``, the single shard is renamed to the reference's exact
    output name ``<prefix>-00000-of-00001.jsonl`` (src/pipeline.py:292-296)
    inside ``out_dir``."""
    writer = df.coalesce(1) if single_shard else df
    writer.write.mode("overwrite").json(out_dir)
    if prefix is not None and single_shard:
        import glob as _glob
        import os as _os

        parts = _glob.glob(_os.path.join(out_dir, "part-*.json"))
        if len(parts) == 1:
            _os.replace(parts[0], _os.path.join(out_dir, f"{prefix}-00000-of-00001.jsonl"))


def resolve_paths(
    root: Path, output_folder: str, json_glob: str | None, csv_path: str | None
) -> tuple[str, str, str]:
    """Path resolution with CSV fallback candidates (reference
    src/pipeline.py:232-256)."""
    glob = json_glob or str(root / "input" / "*fan_engagement-000-of-001.json")
    if not csv_path:
        candidates = [
            root / "input_side" / "country_data_v2.csv",
            root / "input side" / "country_data_v2.csv",
        ]
        csv_path = str(next((p for p in candidates if p.exists()), candidates[0]))
    out_dir = root / output_folder
    out_dir.mkdir(parents=True, exist_ok=True)
    return glob, csv_path, str(out_dir)


def main(argv: list[str] | None = None) -> None:
    """CLI entry (reference src/pipeline.py:206-229): same flags, with
    --runner replaced by Spark's local master."""
    parser = argparse.ArgumentParser(description="HRL fan-engagement ETL (PySpark)")
    parser.add_argument("--input_json_glob", default=None)
    parser.add_argument("--input_csv", default=None)
    parser.add_argument("--output_folder", default="output")
    parser.add_argument("--output_prefix", default="result")
    parser.add_argument("--root", default=os.getcwd())
    args = parser.parse_args(argv)

    from ..session import get_spark

    spark = get_spark("hrl-fidelity")
    glob, csv_path, out_dir = resolve_paths(
        Path(args.root), args.output_folder, args.input_json_glob, args.input_csv
    )
    write_jsonl(build_fidelity_df(spark, glob, csv_path), out_dir,
                prefix=args.output_prefix)


if __name__ == "__main__":
    main()
