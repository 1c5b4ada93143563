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


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingestion: fake blobs on disk -> (path, length,
    content) rows -> multimodal metadata extraction; glob pruning
    filters at listing time."""
    from healthcare_oltp_to_olap_gcp_spark.operators.multimodal import _meta_pdf
    from healthcare_oltp_to_olap_gcp_spark.sources import binary

    blobs = {
        "a.png": b"\x89PNG\r\n\x1a\n" + b"x" * 100,
        "b.jpg": b"\xff\xd8\xff\xe0" + b"y" * 50,
        "notes.txt": b"plain text",
    }
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)

    all_rows = binary.binary_files_as_payload(spark, str(tmp_path))
    got = {r.path.rsplit("/", 1)[-1]: r for r in all_rows.collect()}
    assert set(got) == set(blobs)
    for name, data in blobs.items():
        assert bytes(got[name].payload) == data
        assert got[name].n_bytes == len(data)
    assert got["a.png"].mime == "image/png"
    assert got["notes.txt"].mime == "application/octet-stream"

    # glob pruning happens at listing time
    pngs = binary.binary_files_as_payload(spark, str(tmp_path), glob="*.png")
    assert pngs.count() == 1

    # feeds the multimodal metadata extractor (header sniff on real bytes)
    meta = all_rows.select("doc_id", "payload").mapInPandas(
        _meta_pdf, "doc_id long, n_bytes long, header_hex string"
    )
    headers = {r.doc_id: r.header_hex for r in meta.collect()}
    assert headers[got["a.png"].doc_id] == "89504e47"  # PNG magic
