"""Explicit schemas (SURVEY.md §1.2) and testdata table loaders.

The reference is schemaless (Python dicts end-to-end); here every reader
gets an explicit ``StructType`` so Catalyst can prune/pushdown and no
inference pass is ever paid — at 100 TB an inference scan is a second
full read of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --- Reference fan-engagement input (SURVEY.md §1.2 / reference
#     src/pipeline.py:136-200; all 8 fields observed in input/*.json) ---
FAN_ENGAGEMENT_SCHEMA = T.StructType(
    [
        T.StructField("FanID", T.StringType()),
        T.StructField("RaceID", T.StringType()),
        T.StructField("Timestamp", T.StringType()),  # opaque string in the
        # reference: never parsed (only appears in the KEEP projection,
        # reference src/pipeline.py:190)
        T.StructField("ViewerLocationCountry", T.StringType()),
        T.StructField("DeviceType", T.StringType()),
        T.StructField("EngagementMetric_secondswatched", T.LongType()),
        T.StructField("PredictionClicked", T.BooleanType()),
        T.StructField("MerchandisingClicked", T.BooleanType()),
    ]
)

# LocationData output struct (reference src/pipeline.py:114-120, 174-181).
# NOTE: "official language" legitimately contains a space — legal in Spark
# structs; quote with backticks in SQL paths.
LOCATION_FIELDS = ["country", "capital", "continent", "official language", "currency"]

LOCATION_SCHEMA = T.StructType([T.StructField(f, T.StringType()) for f in LOCATION_FIELDS])

# Output projection order (reference src/pipeline.py:187-196).
KEEP = [
    "FanID",
    "RaceID",
    "Timestamp",
    "DeviceType",
    "EngagementMetric_secondswatched",
    "PredictionClicked",
    "MerchandisingClicked",
    "LocationData",
]

# --- Driver testdata tables (/root/testdata/sf*/; FIXTURES.md §4) ---
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the runtime SQL confs this package's correctness depends on —
    idempotent and safe to call per-query, so results are right even when
    the caller (e.g. the driver harness) built its own SparkSession
    without session.get_spark():

    - nanosAsLong: Spark's reader rejects parquet TIMESTAMP(NANOS)
      (events.ts) outright without it;
    - UTC session timezone: epoch/date-string outputs must match the
      UTC-naive DuckDB oracle regardless of host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata parquet table. Parquet carries its own schema;
    column pruning + predicate pushdown apply automatically.

    Timestamp normalization — the driver has shipped the time columns
    two ways across rounds, and both must land as session-TZ TIMESTAMP
    (LTZ), which every plan here assumes (unix_micros/session_window
    reject TIMESTAMP_NTZ):
    - parquet TIMESTAMP(NANOS): illegal for Spark's reader, arrives as a
      nanosecond long (nanosAsLong) and is truncated to microseconds,
      matching DuckDB/Arrow ns->us truncation;
    - parquet timestamp[us] without tz: read as TIMESTAMP_NTZ, cast to
      TIMESTAMP — value-preserving under the UTC session timezone and
      identical to how the UTC-naive DuckDB oracle sees it."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return normalize_nanos_ts(df)


def normalize_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as TT

    if col in df.columns and isinstance(df.schema[col].dataType, TT.LongType):
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, TT.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(TT.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
