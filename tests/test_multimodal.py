"""Multimodal plumbing, URL IO, LLM operators, checkpointing —
deterministic-fake codecs, real Spark pipelines."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def docs(spark):
    from daft_spark.io.readers import load_table

    return load_table(spark, SF_DIR, "documents").limit(40)


def test_image_pipeline(spark, docs):
    from daft_spark.multimodal.image import decode_image, image_attribute, image_hash, resize

    # binary payload column from text (stand-in for real image bytes)
    b = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    img = decode_image(b, "payload", out_col="image", deterministic_fake=True)
    assert dict(img.dtypes)["image"].startswith("struct<data:binary,height:int")
    row = img.select(
        "doc_id",
        image_attribute("image", "height").alias("h"),
        image_attribute("image", "width").alias("w"),
        image_hash("image").alias("hsh"),
    ).first()
    assert 16 <= row["h"] <= 32 and 16 <= row["w"] <= 32

    resized = resize(img, "image", 8, 8, deterministic_fake=True)
    r2 = resized.select(image_attribute("image", "height").alias("h")).first()
    assert r2["h"] == 8
    # determinism: same payload -> same image hash
    h1 = sorted(r["hsh"] for r in img.select(image_hash("image").alias("hsh")).collect())
    h2 = sorted(r["hsh"] for r in decode_image(b, "payload", deterministic_fake=True)
                .select(image_hash("image").alias("hsh")).collect())
    assert h1 == h2


def test_video_audio_pipeline(spark, docs):
    from daft_spark.multimodal.av import audio_metadata, video_frames, video_metadata

    b = docs.select(
        F.concat(F.lit("video_"), F.col("doc_id")).alias("path"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    meta = video_metadata(b, "path", "payload", deterministic_fake=True)
    m = meta.first()
    assert m["fps"] in (24.0, 30.0) and m["n_frames"] >= 48

    frames = video_frames(b, "path", "payload", sample_every=10, deterministic_fake=True)
    fc = frames.groupBy("path").count().first()
    assert fc["count"] >= 5  # ≥48 frames / 10
    assert dict(frames.dtypes)["data"] == "binary"

    am = audio_metadata(b, "path", "payload", deterministic_fake=True).first()
    assert am["sample_rate"] in (16000, 32000, 48000)


def test_url_download_upload(spark, docs):
    from daft_spark.multimodal.url import download, upload

    with tempfile.TemporaryDirectory() as tmp:
        # write payloads via upload, read back via download
        staged = docs.select(
            "doc_id",
            F.encode("text", "UTF-8").alias("content"),
            F.concat(F.lit(f"{tmp}/blob_"), F.col("doc_id"), F.lit(".bin")).alias("path"),
        )
        written = staged.select("doc_id", "path", upload("content", "path").alias("out_path"))
        n = written.filter(F.col("out_path").isNotNull()).count()
        assert n == docs.count()

        back = staged.select("doc_id", download(F.col("path")).alias("content2"), "content")
        mismatches = back.filter(F.col("content2") != F.col("content")).count()
        assert mismatches == 0

        # on_error='null' path
        bad = spark.createDataFrame([("/nonexistent/x.bin",)], ["p"])
        assert bad.select(download(F.col("p"), on_error="null").alias("c")).first()["c"] is None


def test_llm_operators(spark, docs):
    from daft_spark.multimodal.llm import classify_text, embed_text, llm_generate

    gen = llm_generate(docs.select("doc_id", "text"), "text")
    g = gen.first()
    assert g["generation"].startswith("echo:")

    emb = embed_text(docs.select("doc_id", "text"), "text")
    e = emb.first()
    assert len(e["embedding"]) == 16
    assert abs(sum(x * x for x in e["embedding"]) - 1.0) < 1e-5  # unit norm

    clf = classify_text(docs.select("doc_id", "text"), "text", ["sports", "tech", "news"])
    labels = {r["label"] for r in clf.collect()}
    assert labels <= {"sports", "tech", "news"}

    # determinism across two runs
    a = sorted((r["doc_id"], r["generation"]) for r in gen.collect())
    b = sorted((r["doc_id"], r["generation"]) for r in llm_generate(docs.select("doc_id", "text"), "text").collect())
    assert a == b


def test_checkpoint_skip_existing(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.checkpoint import checkpointed_write, skip_existing

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "ckpt_out")
        # missing output -> pass-through
        assert skip_existing(d, out, ["doc_id"]).count() == d.count()
        # write first half, then checkpointed_write the full set
        first = d.filter(F.col("doc_id") < 100)
        first.write.parquet(out)
        remaining = skip_existing(d, out, ["doc_id"])
        assert remaining.count() == d.count() - first.count()
        checkpointed_write(d, out, ["doc_id"])
        total = spark.read.parquet(out)
        assert total.count() == d.count()
        assert total.select("doc_id").distinct().count() == d.count()
        # idempotent: re-run adds nothing
        checkpointed_write(d, out, ["doc_id"])
        assert spark.read.parquet(out).count() == d.count()


def test_stub_gates_raise_without_fake(spark, docs):
    from daft_spark.multimodal.av import video_metadata
    from daft_spark.multimodal.image import decode_image

    b = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    with pytest.raises(NotImplementedError):
        decode_image(b, "payload")
    with pytest.raises(NotImplementedError):
        video_metadata(b, "doc_id", "payload")


def test_embed_image_classify_image_prompt(spark):
    """AI-function surface (reference ai/: embed_image :157,
    classify_image :329, prompt :453): deterministic providers keep the
    whole pipeline executable — per-executor singleton, Arrow batches,
    1:1 cardinality, stable outputs across runs."""
    from daft_spark.multimodal.llm import classify_image, embed_image, prompt

    df = spark.createDataFrame(
        [(1, bytearray(b"imgbytes-a"), "what is this?"),
         (2, bytearray(b"imgbytes-b"), "and this?")],
        "id long, img binary, q string",
    )
    emb = embed_image(df, "img").orderBy("id").collect()
    assert len(emb) == 2 and len(emb[0]["embedding"]) == 16
    # determinism: same bytes -> same vector
    again = embed_image(df, "img").orderBy("id").collect()
    assert [r["embedding"] for r in again] == [r["embedding"] for r in emb]
    assert emb[0]["embedding"] != emb[1]["embedding"]

    cls = classify_image(df, "img", ["cat", "dog", "car"]).orderBy("id").collect()
    assert all(r["label"] in {"cat", "dog", "car"} for r in cls)

    pr = prompt(df, ["q"], system_message="sys").orderBy("id").collect()
    assert all(r["response"].startswith("echo:") for r in pr)
    # message assembly: system message participates in the prompt
    pr2 = prompt(df, ["q"]).orderBy("id").collect()
    assert pr[0]["response"] != pr2[0]["response"]
    with pytest.raises(ValueError, match="not in frame"):
        prompt(df, ["missing"])
