"""Multimodal column plumbing: BinaryType + meta struct through
mapInPandas (decode stubbed — no codec libs in this container)."""

from __future__ import annotations

import hashlib

import pytest

from kinesis_handler_spark.io.multimodal import (
    MULTIMODAL_SCHEMA,
    _decode_stub,
    decode_and_featurize,
    make_multimodal_df,
)


def test_schema_round_trips_parquet(spark, sf_dir, tmp_path):
    mm = make_multimodal_df(spark, sf_dir)
    mm.write.mode("overwrite").parquet(str(tmp_path / "mm"))
    back = spark.read.parquet(str(tmp_path / "mm"))
    assert dict(back.dtypes)["content"] == "binary"
    assert back.count() == 500
    row = back.filter("media_id = 0").collect()[0]
    assert row["meta"]["mime"] == "image/fake"
    assert isinstance(row["content"], (bytes, bytearray))


def test_decode_and_featurize_fake(spark, sf_dir):
    out = decode_and_featurize(make_multimodal_df(spark, sf_dir), fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 500
    # features are deterministic: recompute one row's stub locally
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id = 3")
    text = src.collect()[0]["text"].encode()
    expect = _decode_stub(text, "image/fake", fake=True)
    assert rows[3]["feature"] == pytest.approx(expect)
    assert rows[3]["content_sha256"] == hashlib.sha256(text).hexdigest()
    assert rows[3]["n_bytes"] == len(text)


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="no codec"):
        _decode_stub(b"\x89PNG", "image/png", fake=False)


def test_envelope_schema_fields():
    names = [f.name for f in MULTIMODAL_SCHEMA.fields]
    assert names == ["media_id", "content", "meta"]
