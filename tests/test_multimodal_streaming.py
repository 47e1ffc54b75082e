"""Multimodal plumbing + streaming parity tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_addr_tools_spark.operators import multimodal as M
from osm_addr_tools_spark.sources import synth as S
from osm_addr_tools_spark.streaming import ingest as ST


def test_media_decode_roundtrip(spark):
    media = M.synth_media(spark, 300)
    dec = M.decode_media(media).toPandas()
    assert len(dec) == 300
    assert dec.ok.all()
    assert set(dec.kind) == {"image", "audio", "video"}
    # header fields deterministic from id
    row = dec[dec.media_id == 17].iloc[0]
    assert row.width == 16 + 17 % 64 and row.height == 16 + (17 * 7) % 48


def test_media_decode_real_is_stubbed(spark):
    media = M.synth_media(spark, 5)
    with pytest.raises(NotImplementedError):
        M.decode_media(media, decoder="real")


def test_media_features_shape_and_determinism(spark):
    media = M.synth_media(spark, 100)
    f1 = M.media_features(media, dim=16).toPandas().sort_values("media_id")
    f2 = M.media_features(media.repartition(7), dim=16).toPandas().sort_values("media_id")
    assert all(len(v) == 16 for v in f1.feature)
    for a, b in zip(f1.feature, f2.feature):
        assert np.allclose(a, b)
    norms = [np.linalg.norm(v) for v in f1.feature]
    assert np.allclose(norms, 1.0)


def test_frame_sample_generator_shape(spark):
    media = M.synth_media(spark, 90)
    frames = M.frame_sample(media, every_n=10).toPandas()
    videos = frames[frames.kind == "video"]
    stills = frames[frames.kind != "video"]
    assert (stills.frame_no == 0).all()
    assert videos.frame_no.max() >= 10  # at least one multi-sample video
    assert len(frames) > 90  # one→many expansion happened


def test_streaming_matches_batch(spark, tmp_path):
    n = 200
    src = str(tmp_path / "pages")
    S.synth_pages(spark, n).write.parquet(src)

    stream = ST.read_pages_stream(spark, src)
    got = ST.run_to_memory(spark, ST.extract_stream(stream), "ex_stream").toPandas()

    from osm_addr_tools_spark.plans.extract import (
        extract_text_udf,
        parse_and_normalize_udf,
    )

    batch = (
        spark.read.parquet(src)
        .select("url", "warc_ts", "html")
        .withColumn("text", extract_text_udf()("html"))
        .withColumn("addr", F.explode(parse_and_normalize_udf()("text")))
        .select("url", "warc_ts", "addr.*")
        .toPandas()
    )
    key = lambda d: sorted(
        map(tuple, d[["url", "addr_key"]].to_numpy())
    )
    assert key(got) == key(batch)
    assert len(got) > 0


def test_streaming_windowed_counts(spark, tmp_path):
    n = 200
    src = str(tmp_path / "pages2")
    S.synth_pages(spark, n).write.parquet(src)
    stream = ST.read_pages_stream(spark, src)
    counts = ST.run_to_memory(
        spark, ST.windowed_lang_counts(stream, "1 hour"), "win_counts", mode="complete"
    ).toPandas()
    total_stream = counts.n_pages.sum()
    total_batch = spark.read.parquet(src).count()
    assert total_stream == total_batch
    assert set(counts.lang) == {"pl", "en", "de"}
