"""Multimodal plumbing tests: the Arrow/mapInPandas path runs end-to-end
with the deterministic fake decoder; the real decoder slot fails loudly."""

import numpy as np
import pytest

from dataingestion_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    fake_image_decoder,
    gen_media,
    media_stats,
    real_image_decoder,
)


def test_gen_media_is_deterministic(spark):
    a = gen_media(spark, 50).toPandas()
    b = gen_media(spark, 50).toPandas()
    assert a.equals(b)
    assert set(a["kind"]) <= {"image", "audio", "video"}
    assert a["content"].map(len).eq(64).all()  # 32 hex chars x4 = 128 hex = 64 bytes


def test_extract_features_via_mapinpandas(spark):
    media = gen_media(spark, 40)
    feats = extract_features(media, decoder=fake_image_decoder, feature_dim=16)
    assert feats.schema == FEATURE_SCHEMA
    pdf = feats.toPandas()
    assert len(pdf) == 40
    assert pdf["feature"].map(len).eq(16).all()
    assert pdf["n_bytes"].gt(0).all()
    # deterministic features
    pdf2 = extract_features(media, decoder=fake_image_decoder, feature_dim=16).toPandas()
    f1 = np.stack(pdf.sort_values("media_id")["feature"].values)
    f2 = np.stack(pdf2.sort_values("media_id")["feature"].values)
    assert np.array_equal(f1, f2)


def test_real_decoder_slot_fails_loudly():
    with pytest.raises(NotImplementedError):
        real_image_decoder(b"\x89PNG")


def test_media_stats(spark):
    stats = media_stats(gen_media(spark, 60)).toPandas()
    assert stats["n"].sum() == 60
    assert (stats["total_bytes"] > 0).all()
