"""Source/sink coverage beyond parquet: CSV and JSON round-trips with
explicit schemas (no inferSchema — production rule), landing back
byte-equal with the parquet original."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_oltp_to_olap_gcp_spark.catalog import table

from .conftest import SF001
from .helpers import normalize

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

COLS = [f.name for f in EVENTS_SCHEMA.fields]


def test_csv_roundtrip(spark, tmp_path):
    events = table(spark, SF001, "events").select(*COLS)
    path = str(tmp_path / "events_csv")
    events.write.option("header", True).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).csv(path)
    back = (
        spark.read.schema(EVENTS_SCHEMA)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )
    assert normalize(back.toPandas()) == normalize(events.toPandas())


def test_json_roundtrip(spark, tmp_path):
    events = table(spark, SF001, "events").select(*COLS)
    path = str(tmp_path / "events_json")
    events.write.option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").json(path)
    back = (
        spark.read.schema(EVENTS_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(path)
    )
    assert normalize(back.toPandas()) == normalize(events.toPandas())


def test_orc_roundtrip(spark, tmp_path):
    events = table(spark, SF001, "events").select(*COLS)
    path = str(tmp_path / "events_orc")
    events.write.orc(path)
    back = spark.read.schema(EVENTS_SCHEMA).orc(path)
    assert normalize(back.toPandas()) == normalize(events.toPandas())
