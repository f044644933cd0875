"""StageStore resume, streaming ingest, multimodal plumbing, and the
no-per-row-Python lint (BASELINE.json input_hint)."""

import glob
import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from gstored_spark.kg.metrics import StageStore
from gstored_spark.operators import multimodal as MM


def test_stage_store_resume_and_metrics(spark, tmp_path):
    root = str(tmp_path / "store")
    store = StageStore(spark, root, resume=True)
    df = spark.range(10).withColumn("part", (F.col("id") % 3).cast("int"))
    out1 = store.materialize("stage_a", df, "part")
    assert out1.count() == 10
    # resume: a poisoned recompute would fail if actually executed
    poisoned = spark.range(5).withColumn(
        "part", (F.col("id") / F.lit(0)).cast("int")
    )
    out2 = store.materialize("stage_a", poisoned, "part")
    assert out2.count() == 10  # read from snapshot, not recomputed
    m = store.metrics()
    rows = m.filter("stage = 'stage_a'").collect()
    assert {r["part"] for r in rows} == {0, 1, 2}
    assert sum(r["rows"] for r in rows) == 10
    assert all(r["snapshot_id"].startswith("stage_a-") for r in rows)


def test_streaming_ingest(spark, tmp_path, docs200):
    from gstored_spark.streaming.ingest import (
        start_ingest,
        stream_documents,
        stream_mention_triples,
    )
    from gstored_spark.kg import partition as P

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs200.limit(40).write.parquet(in_dir)

    stream = stream_mention_triples(stream_documents(spark, in_dir))
    routed = stream.withColumn("part", P.owner(F.xxhash64("subj_mention"), 4))
    q = (
        routed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .partitionBy("part")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() > 0
    assert set(got.columns) >= {"subj_mention", "pred", "obj_mention"}


def test_stream_routed_parked_and_crossing(spark):
    """stream_routed resolves against snapshot dictionaries: unseen terms go
    to the parked side output (nothing silently dropped), and crossing
    entity edges are replicated to the object's partition like the batch
    path (gloadD.cpp:127-146 locality invariant)."""
    from gstored_spark.streaming.ingest import stream_routed
    from gstored_spark.kg.partition import owner

    mentions = spark.createDataFrame(
        [
            ("<e:a>", "<p:knows>", "<e:b>", True),
            ("<e:b>", "<p:name>", "bee", False),
            ("<e:unknown>", "<p:knows>", "<e:a>", True),  # unseen subject
        ],
        ["subj_mention", "pred", "obj_mention", "o_is_entity"],
    )
    entity_dict = spark.createDataFrame(
        [("<e:a>", 0), ("<e:b>", 1)], ["term", "id"])
    literal_dict = spark.createDataFrame([('"bee"@en', 10**9)], ["term", "id"])
    pred_dict = spark.createDataFrame(
        [("<p:knows>", 0), ("<p:name>", 1)], ["term", "id"])
    routed, parked = stream_routed(mentions, entity_dict, literal_dict, pred_dict, 4)
    p = parked.collect()
    assert [(r["subj"], r["obj"]) for r in p] == [("<e:unknown>", "<e:a>")]
    rows = routed.collect()
    n_parts = 4
    own = {r["s"]: r["part"] for r in
           routed.select("s", owner(F.col("s"), n_parts).alias("part")).collect()}
    for r in rows:
        if not r["is_crossing"]:
            assert r["part"] == own[r["s"]]
    # the (0 knows 1) edge must exist in vertex 1's partition too if different
    e01 = [r for r in rows if r["s"] == 0 and r["o"] == 1]
    parts = {r["part"] for r in e01}
    o_own = routed.select(owner(F.lit(1).cast("long"), n_parts)).first()[0]
    assert o_own in parts


def test_multimodal_features_and_stubs(spark):
    media = MM.synthetic_media(spark, 12)
    feats = {r["media_id"]: r for r in MM.byte_features(media).collect()}
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, p in payloads.items():
        arr = np.frombuffer(p, dtype=np.uint8)
        assert feats[mid]["n_bytes"] == len(p)
        assert abs(feats[mid]["byte_mean"] - arr.mean()) < 1e-9
    # REAL image decode: BMP payloads, no fake flag
    dec = {r["media_id"]: r for r in MM.decoded_images(media, fake=False).collect()}
    for i, r in dec.items():
        w, h = 4 + (i % 5), 3 + (i % 4)
        want = bytes(((i * 7 + j) % 256) for j in range(w * h * 3))
        assert (r["width"], r["height"]) == (w, h)
        assert bytes(r["pixels"]) == want  # exact roundtrip through the codec
    stats = {r["media_id"]: r for r in
             MM.image_pixel_stats(MM.decoded_images(media, fake=False)).collect()}
    for i, r in stats.items():
        w, h = 4 + (i % 5), 3 + (i % 4)
        arr = np.frombuffer(bytes(dec[i]["pixels"]), dtype=np.uint8).reshape(h, w, 3)
        assert abs(r["mean_r"] - arr.reshape(-1, 3)[:, 0].mean()) < 1e-9
    # non-BMP decode without the fake flag must raise (stub clearly marked)
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xx", fake=False)
    frames = MM.sample_frames(media, every_ms=1000, fake=True)
    per = {r["media_id"]: r["frame_idx"] for r in frames.collect()}
    assert len(per) > 0


def test_wav_roundtrip_and_audio_stats(spark):
    sr = 8000
    t = np.arange(2000, dtype=np.float64)
    samples = (1000 * np.sin(2 * np.pi * 220 * t / sr)).astype(np.int16)
    rate, got = MM.decode_wav(MM.encode_wav(sr, samples))
    assert rate == sr and np.array_equal(got, samples)
    media = MM.synthetic_media(spark, 12)
    rows = {r["media_id"]: r for r in MM.decoded_audio(media).collect()}
    assert len(rows) == 4  # ids 1,4,7,10
    for mid, r in rows.items():
        assert r["sample_rate"] == 8000 and r["n_samples"] == 2000
        want = (1000 * np.sin(2 * np.pi * (220 + mid)
                              * np.arange(2000, dtype=np.float64) / 8000)).astype(np.int16)
        assert abs(r["rms"] - float(np.sqrt(np.mean(want.astype(np.float64) ** 2)))) < 1e-6


def test_no_per_row_python_udf_lint():
    """input_hint: vectorized pandas/Arrow UDFs only — no F.udf( anywhere."""
    root = os.path.join(os.path.dirname(__file__), "..", "gstored_spark")
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        src = open(path).read()
        if re.search(r"\bF\.udf\(|\budf\(lambda|@udf\b", src):
            offenders.append(path)
    assert not offenders, f"row-at-a-time UDFs found: {offenders}"


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions close by observed
    in-batch gaps AND by event-time timeout (watermark passing last+gap),
    and the closed set equals the batch gaps-and-islands rule."""
    import pandas as pd

    from gstored_spark.streaming.sessionize import stream_sessionize

    in_dir = str(tmp_path / "ev_in")
    ck_dir = str(tmp_path / "ev_ck")
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def write_file(name, rows):
        pdf = spark.createDataFrame(
            [
                (eid, (t0 + pd.Timedelta(seconds=s)).to_pydatetime(), uid)
                for eid, s, uid in rows
            ],
            "event_id long, ts timestamp, user_id long",
        )
        pdf.coalesce(1).write.mode("append").parquet(in_dir)

    # batch 1: user 1 session A (3 events, tight)
    write_file("f1", [(1, 0, 1), (2, 60, 1), (3, 120, 1)])
    # batch 2: user 1 session B starts after a 1-hour silence (closes A by
    # in-batch... no — A's events are in a PRIOR batch; the 3600s gap is
    # observed against the SAVED STATE), user 2 opens a session
    write_file("f2", [(4, 3720, 1), (5, 3780, 1), (6, 3800, 2)])
    # batch 3: a far-future sentinel advances the watermark past B's
    # deadline -> user 1 session B emits via EventTimeTimeout
    write_file("f3", [(7, 50_000, 3)])

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long"
    ).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        stream_sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["n_events"], r["first_event"], r["last_event"])
        for r in spark.sql("select * from sess_out").collect()
    }
    # closed: user1 A (events 1-3) by the gap between saved state and
    # batch-2 events; user1 B (events 4-5) and user2 (event 6) by
    # EventTimeTimeout once the sentinel advances the GLOBAL watermark
    # past their deadlines; user3's sentinel session stays OPEN (the
    # watermark never passes 50000+gap) and must NOT be emitted
    assert got == {(1, 3, 1, 3), (1, 2, 4, 5), (2, 1, 6, 6)}
