"""Unit tests for the training-data ops layer (cross-engine hash
primitive, shingles, multimodal stubs/batch shape)."""

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("GRATE_TEST_SF", "/root/testdata/sf0.001")


def test_md5_bigint_cross_engine(spark, duck):
    from grate_spark.ops import md5_bigint_expr, md5_bigint_sql

    got = spark.range(1).select(
        F.expr(md5_bigint_expr("'hello world'", 7)).alias("h")) \
        .collect()[0]["h"]
    want = duck.execute(
        "SELECT " + md5_bigint_sql("'hello world'", 7)).fetchone()[0]
    assert got == want > 0


def test_shingles_cross_engine(spark, duck):
    from grate_spark.ops import word_shingles_expr, word_shingles_sql

    got = spark.createDataFrame([("a b c d e",)], "text string") \
        .select(F.expr(word_shingles_expr("text", 3)).alias("s")) \
        .collect()[0]["s"]
    want = duck.execute(
        "SELECT " + word_shingles_sql("'a b c d e'", 3)).fetchone()[0]
    assert got == want == ["a b c", "b c d", "c d e"]


def test_multimodal_decode_stubs_raise():
    from grate_spark.operators import multimodal as mm

    for fn in (mm.decode_image, mm.decode_audio):
        with pytest.raises(NotImplementedError):
            fn(b"\x00\x01")
    with pytest.raises(NotImplementedError):
        mm.sample_video_frames(b"\x00", every_n=2)


def test_multimodal_feature_batch_shape(spark):
    """One blob row -> one feature row; sha256 matches hashlib; media
    type tags deterministic."""
    import hashlib
    from grate_spark.operators.multimodal import (docs_as_media,
                                                  extract_media_features)

    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "y" * 3000), (3, "")],
        "doc_id long, text string")
    out = extract_media_features(docs_as_media(docs)) \
        .orderBy("media_id").collect()
    assert [r["media_type"] for r in out] == ["image", "audio", "video",
                                              "blob"]
    assert out[0]["n_bytes"] == 5
    assert out[2]["n_frames"] == 1 + 3000 // 1024
    assert out[0]["content_sha256"] == hashlib.sha256(b"alpha").hexdigest()


def test_simhash_within_bit_range(spark):
    from grate_spark.ops.dedup import simhash_fingerprints, SIMHASH_BITS

    rows = simhash_fingerprints(spark, SF).collect()
    assert rows, "no fingerprints produced"
    for r in rows:
        assert 0 <= r["simhash"] < (1 << SIMHASH_BITS)


def test_minhash_identical_docs_collide(spark):
    """Identical texts must produce identical signatures and an LSH
    pair; disjoint texts must not pair."""
    from grate_spark.ops import md5_bigint_expr, word_shingles_expr
    from grate_spark.ops.dedup import N_HASHES

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over dog"),
         (2, "the quick brown fox jumps over dog"),
         (3, "completely different words entirely here now")],
        "doc_id long, text string") \
        .withColumn("shingles", F.expr(word_shingles_expr("text", 3)))
    sigs = df.select("doc_id", *[
        F.expr(f"array_min(transform(shingles, s -> "
               f"{md5_bigint_expr('s', j)}))").alias(f"mh{j}")
        for j in range(N_HASHES)]).collect()
    by_id = {r["doc_id"]: [r[f"mh{j}"] for j in range(N_HASHES)]
             for r in sigs}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]
