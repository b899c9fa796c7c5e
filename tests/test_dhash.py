"""Perceptual dHash (operators/multimodal.py): real-decode hashing,
brightness invariance, content sensitivity, null-not-panic."""

from __future__ import annotations

from pyspark.sql import Row

from database_collector_spark.operators import multimodal


def _ppm(w: int, h: int, gray_fn) -> bytes:
    header = f"P6\n{w} {h}\n255\n".encode()
    raster = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in [gray_fn(x, y)] * 3
    )
    return header + raster


def _media_df(spark, payloads):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                media_type="image",
                payload=p,
                meta=Row(n_bytes=len(p) if p else 0, declared_format="ppm"),
            )
            for i, p in enumerate(payloads)
        ]
    )


def test_dhash_brightness_invariant_content_sensitive(spark):
    base = _ppm(9, 8, lambda x, y: (x * 17 + y * 29) % 200)
    brighter = _ppm(9, 8, lambda x, y: (x * 17 + y * 29) % 200 + 50)
    flipped = _ppm(9, 8, lambda x, y: ((8 - x) * 17 + y * 29) % 200)
    df = _media_df(spark, [base, brighter, flipped])
    got = {r["doc_id"]: r["dhash"] for r in multimodal.dhash_images(df).collect()}
    assert got[0] == got[1]  # constant shift cancels in neighbor compares
    assert got[0] != got[2]  # mirrored gradient flips bits
    assert len(got[0]) == 16 and int(got[0], 16) >= 0


def test_dhash_bit_order_known_value(spark):
    # gray strictly increasing left->right: every comparison true -> all
    # 64 bits set.
    inc = _ppm(9, 8, lambda x, y: x * 10)
    dec = _ppm(9, 8, lambda x, y: 100 - x * 10)
    df = _media_df(spark, [inc, dec])
    got = {r["doc_id"]: r["dhash"] for r in multimodal.dhash_images(df).collect()}
    assert got[0] == "f" * 16
    assert got[1] == "0" * 16


def test_dhash_null_on_malformed_or_wrong_dims(spark):
    wrong_dims = _ppm(4, 4, lambda x, y: x)
    junk = b"JFIF not a ppm"
    df = _media_df(spark, [wrong_dims, junk, None])
    got = {r["doc_id"]: r["dhash"] for r in multimodal.dhash_images(df).collect()}
    assert got == {0: None, 1: None, 2: None}


def test_gradient_fixture_same_pattern_same_hash(spark):
    # doc_ids 3 and 53 share pid=3 but differ in brightness (3%3=0 vs
    # 53%3=2): payloads differ bytewise, dHash collides.
    docs = spark.createDataFrame([Row(doc_id=3), Row(doc_id=53)])
    media = multimodal.to_gradient_ppm_media(docs)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert payloads[3] != payloads[53]
    got = {r["doc_id"]: r["dhash"] for r in multimodal.dhash_images(media).collect()}
    assert got[3] == got[53]
