"""Source connectors: CSV encoding fallback (S1) and multimodal
binary-column plumbing (stubbed decode, real Spark plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources import (
    extract_media_features,
    media_schema,
    read_csv_with_encodings,
)


def test_csv_utf8(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("id,name\n1,Ana\n2,Béla\n", encoding="utf-8")
    df = read_csv_with_encodings(spark, str(p))
    assert df.count() == 2
    assert [r["name"] for r in df.orderBy("id").collect()] == ["Ana", "Béla"]


def test_csv_latin1_fallback(spark, tmp_path):
    p = tmp_path / "latin.csv"
    p.write_bytes("id,name\n1,Bj\xf6rk\n".encode("latin1"))
    df = read_csv_with_encodings(spark, str(p))
    assert [r["name"] for r in df.collect()] == ["Björk"]


def test_csv_all_string_schema(spark, tmp_path):
    p = tmp_path / "types.csv"
    p.write_text("a,b\n1,2.5\n", encoding="utf-8")
    df = read_csv_with_encodings(spark, str(p))
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", "s3://bucket/a.png"),
        (2, "audio", b"RIFF fake wav", "s3://bucket/b.wav"),
        (3, "video", None, "s3://bucket/c.mp4"),
    ]
    return spark.createDataFrame(rows, media_schema())


def test_media_features_deterministic(spark, media):
    out1 = extract_media_features(media).orderBy("media_id").collect()
    out2 = extract_media_features(media).orderBy("media_id").collect()
    assert out1 == out2  # stub is deterministic in payload bytes
    img = out1[0]
    assert img["width"] is not None and img["height"] is not None
    assert len(img["feature"]) == 8
    aud = out1[1]
    assert aud["duration_ms"] is not None and aud["width"] is None
    assert out1[2]["n_bytes"] == 0  # NULL payload handled


def test_media_strict_mode_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_media_features(media, strict=True).collect()


def test_media_no_shuffle(spark, media):
    plan = extract_media_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # payload bytes never shuffle


# -- RAWM real-codec tests ---------------------------------------------------


def test_rawm_image_roundtrip(spark):
    import numpy as np

    from data_warehouse_project_spark.sources.multimodal import (
        encode_image,
        resize_image,
    )

    # constant-valued 32x16 RGB image: every mean is the constant
    px = np.full((32, 16, 3), 7, dtype=np.uint8)
    rows = [(1, "image", encode_image(px), "mem://img")]
    out = extract_media_features(
        spark.createDataFrame(rows, media_schema()), strict=True
    ).collect()[0]
    assert (out["width"], out["height"]) == (16, 32)
    assert out["duration_ms"] is None
    feat = out["feature"]
    assert all(abs(f - 7.0) < 1e-6 for f in feat[:7])  # quads + channels
    assert abs(feat[7]) < 1e-6  # std of constant image
    # resize is real nearest-neighbor sampling
    thumb = resize_image(px, 8, 8)
    assert thumb.shape == (8, 8, 3) and (thumb == 7).all()


def test_rawm_audio_duration_and_rms(spark):
    import numpy as np

    from data_warehouse_project_spark.sources.multimodal import encode_audio

    # 1.5s of a constant-amplitude square-ish signal at 8kHz
    samples = np.full(12000, 1000, dtype=np.int16)
    rows = [(2, "audio", encode_audio(8000, samples), "mem://aud")]
    out = extract_media_features(
        spark.createDataFrame(rows, media_schema()), strict=True
    ).collect()[0]
    assert out["duration_ms"] == 1500
    assert out["width"] is None
    assert all(abs(f - 1000.0) < 1e-3 for f in out["feature"])


def test_rawm_video_frame_sampling(spark):
    import numpy as np

    from data_warehouse_project_spark.sources.multimodal import encode_video

    # 4 frames with increasing constant brightness 10,20,30,40 @ 2fps
    frames = np.stack(
        [np.full((8, 8, 1), v, dtype=np.uint8) for v in (10, 20, 30, 40)]
    )
    rows = [(3, "video", encode_video(frames, 2), "mem://vid")]
    out = extract_media_features(
        spark.createDataFrame(rows, media_schema()), strict=True
    ).collect()[0]
    assert out["duration_ms"] == 2000
    assert (out["width"], out["height"]) == (8, 8)
    assert out["feature"][:4] == [10.0, 20.0, 30.0, 40.0]


def test_rawm_decodes_in_strict_mode_but_jpeg_refuses(spark):
    import numpy as np

    from data_warehouse_project_spark.sources.multimodal import encode_image

    good = (1, "image", encode_image(np.zeros((4, 4), np.uint8)), "mem://ok")
    bad = (2, "image", b"\xff\xd8\xff\xe0 jpeg bytes", "mem://no")
    ok = extract_media_features(
        spark.createDataFrame([good], media_schema()), strict=True
    ).collect()
    assert ok[0]["width"] == 4
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_media_features(
            spark.createDataFrame([bad], media_schema()), strict=True
        ).collect()


# -- CSV → staging end-to-end (reference §3.1 entry point twin) -------------


def test_run_full_etl_from_csv_sources(spark, tmp_path):
    """Export the sf0.001 source tables to CSV, run the FULL pipeline
    with src_format='csv', and check it lands the same fact row count
    as the parquet-driven pipeline — the runnable twin of the
    reference's pandas→staging import (import_data.py:92)."""
    import datetime as dt

    import duckdb

    from data_warehouse_project_spark.etl import Warehouse, run_full_etl
    from tests.conftest import SF_SMOKE

    csv_dir = tmp_path / "csv_src"
    csv_dir.mkdir()
    con = duckdb.connect()
    for t in ("customer", "nation", "region", "supplier", "part", "lineitem", "orders"):
        con.execute(
            f"COPY (SELECT * FROM '{SF_SMOKE}/{t}.parquet') "
            f"TO '{csv_dir / t}.csv' (HEADER, DELIMITER ',')"
        )

    t0 = dt.datetime(2024, 1, 1)
    root_csv = str(tmp_path / "wh_csv")
    root_pq = str(tmp_path / "wh_pq")
    run_full_etl(spark, str(csv_dir), root_csv, run_ts=t0, src_format="csv")
    run_full_etl(spark, SF_SMOKE, root_pq, run_ts=t0)

    wh_csv = Warehouse(spark, root_csv)
    wh_pq = Warehouse(spark, root_pq)
    for layer, name in (
        ("staging", "sales"),
        ("staging", "customers"),
        ("bl_dm", "fct_sales"),
        ("bl_dm", "dim_customers"),
    ):
        assert (
            wh_csv.read(layer, name).count() == wh_pq.read(layer, name).count()
        ), f"{layer}.{name} row count differs between csv and parquet sources"


def test_source_reader_rejects_unknown_format(spark):
    from data_warehouse_project_spark.etl.pipeline import _source_reader

    with pytest.raises(ValueError, match="unknown src_format"):
        _source_reader(spark, "/tmp", "orc")


def test_csv_dotted_headers_survive_probe(spark, tmp_path):
    """A header containing a dot must not be parsed as a nested-field
    reference by the encoding probe (backtick quoting)."""
    p = tmp_path / "dot.csv"
    p.write_text("price.usd,name\n1.5,widget\n")
    df = read_csv_with_encodings(spark, str(p))
    assert df.columns == ["price.usd", "name"]
    assert df.count() == 1


def test_csv_cp1252_smart_quotes_decode_correctly(spark, tmp_path):
    """cp1252 bytes in 0x80-0x9F (smart quotes) must decode via cp1252,
    not be mojibake'd by latin1 (which accepts every byte and would
    otherwise shadow cp1252 in the fallback order)."""
    p = tmp_path / "q.csv"
    p.write_bytes('id,quote\n1,“hello”\n'.encode("cp1252"))
    df = read_csv_with_encodings(spark, str(p))
    assert df.collect()[0]["quote"] == "“hello”"


def test_sample_video_frames_explode_resize_compose(spark):
    import numpy as np

    from data_warehouse_project_spark.sources.multimodal import (
        encode_image,
        encode_video,
        media_schema,
        sample_video_frames,
    )

    # 10 frames, brightness 0,10,..,90 @ 5fps; one image row to be dropped
    frames = np.stack(
        [np.full((16, 12, 3), v * 10, dtype=np.uint8) for v in range(10)]
    )
    rows = [
        (7, "video", encode_video(frames, 5), "mem://vid"),
        (8, "image", encode_image(np.zeros((4, 4), np.uint8)), "mem://img"),
    ]
    media = spark.createDataFrame(rows, media_schema())

    out = sample_video_frames(media, max_frames=4).collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 5, 7]
    assert all(r["media_id"] == 7 and r["n_frames"] == 10 for r in out)
    assert [r["ts_ms"] for r in out] == [0, 400, 1000, 1400]
    assert all((r["width"], r["height"]) == (12, 16) for r in out)

    # resized frames stay valid RAWM images: feed them back through
    # extract_media_features and check per-frame brightness survives
    from data_warehouse_project_spark.sources.multimodal import (
        extract_media_features,
    )

    small = sample_video_frames(media, max_frames=4, resize_to=(8, 8))
    feat_in = small.select(
        small["media_id"] * 100 + small["frame_idx"],
        F.lit("image"),
        small["frame"],
        F.lit("mem://frame"),
    ).toDF("media_id", "media_type", "payload", "source_uri")
    feats = extract_media_features(feat_in, strict=True).orderBy("media_id")
    got = [(r["media_id"], r["width"], r["height"], r["feature"][0]) for r in feats.collect()]
    assert got == [
        (700, 8, 8, 0.0),
        (702, 8, 8, 20.0),
        (705, 8, 8, 50.0),
        (707, 8, 8, 70.0),
    ]


def test_sample_video_frames_strict_refuses_non_rawm(spark):
    import pytest as _pytest

    from data_warehouse_project_spark.sources.multimodal import (
        media_schema,
        sample_video_frames,
    )

    rows = [(9, "video", b"\x00\x01\x02mp4ish-not-rawm", "mem://bad")]
    media = spark.createDataFrame(rows, media_schema())
    assert sample_video_frames(media, strict=False).count() == 0
    with _pytest.raises(Exception, match="external codec"):
        sample_video_frames(media, strict=True).collect()


def test_sample_video_frames_truncated_payload_dropped_not_crash(spark):
    import struct

    import pytest as _pytest

    from data_warehouse_project_spark.sources.multimodal import (
        MAGIC,
        media_schema,
        sample_video_frames,
    )

    # valid header claiming 10 frames of 4x4x3, but a short body
    truncated = MAGIC + struct.pack("<BHHBHB", 3, 4, 4, 3, 10, 5) + b"short"
    media = spark.createDataFrame(
        [(11, "video", truncated, "mem://trunc")], media_schema()
    )
    assert sample_video_frames(media, strict=False).count() == 0
    with _pytest.raises(Exception, match="external codec"):
        sample_video_frames(media, strict=True).collect()
