"""CSV ingestion (CSVReaderPrimitive analogue): schema-first scan, parquet
parity, corrupt-row quarantine."""

from __future__ import annotations

import numpy as np

from tods_spark.sources.csv_source import CORRUPT_COL, quarantine_split, read_csv

EVENTS_DDL = ("event_id bigint, ts timestamp, event_type string, "
              "value double, user_id bigint")


def test_csv_round_trips_events_table(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cols = ["event_id", "ts", "event_type", "value", "user_id"]
    src = str(tmp_path / "events_csv")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # keep microseconds through text
    # the parquet ts is TIMESTAMP_NTZ → the CSV writer formats it with
    # timestampNTZFormat (timestampFormat only covers TIMESTAMP_LTZ)
    (ev.select(cols).coalesce(1).write.option("header", True)
     .option("timestampNTZFormat", fmt).csv(src))

    got = (read_csv(spark, src, EVENTS_DDL, ts_cols=("ts",), ts_format=fmt)
           .orderBy("event_id").toPandas())
    exp = ev.select(cols).orderBy("event_id").toPandas()
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["event_id"], exp["event_id"])
    np.testing.assert_array_equal(got["event_type"], exp["event_type"])
    np.testing.assert_allclose(got["value"], exp["value"], rtol=1e-12)
    np.testing.assert_array_equal(
        got["ts"].astype("datetime64[us]"), exp["ts"].astype("datetime64[us]")
    )


def test_csv_quarantines_malformed_rows(spark, tmp_path):
    src = tmp_path / "bad_csv"
    src.mkdir()
    (src / "part.csv").write_text(
        "event_id,ts,event_type,value,user_id\n"
        "1,2024-01-01 00:00:00,view,1.5,7\n"
        "not_an_int,garbage,view,xx,yy\n"
        "2,2024-01-01 00:01:00,click,2.5,8\n"
    )
    df = read_csv(spark, str(src), EVENTS_DDL, keep_corrupt=True)
    clean, bad = quarantine_split(df)
    assert clean.count() == 2
    assert bad.count() == 1
    assert CORRUPT_COL in bad.columns
    # default path silently drops the corrupt row, never fails the scan
    assert read_csv(spark, str(src), EVENTS_DDL).count() == 2
