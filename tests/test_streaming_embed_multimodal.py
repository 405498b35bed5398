"""Streaming extraction, hashing embedder, multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from document_automation_spark.functions.embed import (
    assign_dense_vector_ids,
    embed_documents,
    embed_text,
    missing_embeddings,
)
from document_automation_spark.operators.extract import ExtractConfig, extract_documents
from document_automation_spark.operators.multimodal import (
    crop_box,
    decode_image,
    media_metadata,
    sniff_format,
)
from document_automation_spark.sources.pages import PAGES_SCHEMA, pages_df
from document_automation_spark.streaming.pipeline import (
    start_streaming_extraction,
    streaming_event_rollup,
)


class TestStreamingExtraction:
    def test_stream_matches_batch(self, spark, tmp_path):
        input_dir = str(tmp_path / "pages_in")
        output_dir = str(tmp_path / "docs_out")
        checkpoint = str(tmp_path / "ckpt")

        pages = pages_df(spark, 80, partitions=4)
        pages.write.parquet(input_dir)

        q = start_streaming_extraction(
            spark, input_dir, output_dir, checkpoint, ExtractConfig(n_buckets=4)
        )
        q.processAllAvailable()
        q.stop()

        got = sorted(
            (r.url, r.passage_idx, r.content)
            for r in spark.read.parquet(output_dir).collect()
        )
        expected = sorted(
            (r.url, r.passage_idx, r.content)
            for r in extract_documents(pages, ExtractConfig(n_buckets=4)).collect()
        )
        assert got == expected

    def test_event_rollup_watermarked(self, spark, sf_dir, tmp_path):
        # the streaming file source wants a directory of drops
        events_dir = str(tmp_path / "events_in")
        spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
            )
            .parquet(events_dir)
        )
        agg = streaming_event_rollup(stream)
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("rollup_out")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.sql("SELECT * FROM rollup_out")
        batch = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        # append mode only emits windows closed by the watermark; every
        # emitted row must match the batch aggregate exactly.
        got_rows = {(r.hour, r.event_type): r.n_events for r in got.collect()}
        batch_rows = {(r.hour, r.event_type): r.n_events for r in batch.collect()}
        assert got_rows
        for key, n in got_rows.items():
            assert batch_rows[key] == n


class TestStatefulStreaming:
    def test_user_totals_match_batch(self, spark, sf_dir, tmp_path):
        from document_automation_spark.streaming.pipeline import streaming_user_totals

        events_dir = str(tmp_path / "ev_state_in")
        spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )
        q = (
            streaming_user_totals(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("user_totals")
            .option("checkpointLocation", str(tmp_path / "ckpt_state"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # memory sink in update mode accumulates intermediate rows; the row
        # with the highest n_events per user is the final state
        latest = {}
        for r in spark.sql("SELECT * FROM user_totals").collect():
            prev = latest.get(r.user_id)
            if prev is None or r.n_events > prev[0]:
                latest[r.user_id] = (r.n_events, r.sum_value)
        expected = {
            r.user_id: (r.n, round(r.s, 6))
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("s"),
            )
            .collect()
        }
        assert set(latest) == set(expected)
        for uid, (n, s) in expected.items():
            assert latest[uid][0] == n, uid
            assert abs(latest[uid][1] - s) < 1e-6, uid


class TestEmbed:
    def test_embed_deterministic_normalized(self):
        v1 = embed_text("spark distributed dataframe engine")
        v2 = embed_text("spark distributed dataframe engine")
        assert v1 == v2
        norm = math.sqrt(sum(x * x for x in v1))
        assert norm == pytest.approx(1.0, abs=1e-3)

    def test_embed_documents_matches_kernel(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        got = {r.doc_id: list(r.embedding) for r in embed_documents(docs).collect()}
        for r in docs.collect():
            expected = embed_text(r.text)
            assert got[r.doc_id] == pytest.approx(expected, abs=1e-6)

    def test_dense_vector_ids(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        out = assign_dense_vector_ids(embed_documents(docs)).collect()
        ids = sorted(r.vector_id for r in out)
        assert ids == list(range(len(out)))  # dense 0-based (A9 parity)
        by_doc = sorted(out, key=lambda r: r.doc_id)
        assert [r.vector_id for r in by_doc] == ids  # ordered by doc_id

    def test_dense_ids_survive_cache_eviction(self, spark, sf_dir):
        """Ids must stay dense + identical when the persisted range
        partitioning is dropped and recomputed (RangePartitioner boundary
        sampling is seed-deterministic on the same input) — the correctness
        property the MEMORY_AND_DISK cache is an optimization for, not a
        dependency of."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
        handles: list = []
        out = assign_dense_vector_ids(embed_documents(docs), cache_registry=handles)
        first = {r.doc_id: r.vector_id for r in out.collect()}
        assert len(handles) == 1
        # evict the cached partitioning: the next materialization recomputes
        # through repartitionByRange from scratch
        handles[0].unpersist(blocking=True)
        second = {r.doc_id: r.vector_id for r in out.collect()}
        assert first == second
        assert sorted(second.values()) == list(range(len(second)))

    def test_missing_embeddings_resume_predicate(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
        partial = embed_documents(docs.filter(F.col("doc_id") < 10))
        missing = missing_embeddings(docs, partial)
        assert {r.doc_id for r in missing.select("doc_id").collect()} == {
            r.doc_id for r in docs.filter(F.col("doc_id") >= 10).collect()
        }


class TestMultimodal:
    def test_sniff_and_crop(self):
        assert sniff_format(b"\x89PNG\r\n") == "png"
        assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
        assert sniff_format(b"plain") is None
        # crop parity: int truncation (utils.py:31-34)
        assert crop_box(1000, 800) == (0, 40, 700, 720)
        assert crop_box(333, 555) == (0, 27, 233, 499)

    def test_decode_real_for_png_jpeg_gif(self):
        """Round-4 verdict #5: PNG/JPEG/GIF dims decode for REAL (stdlib
        header parse) — deterministic_fake no longer applies to them."""
        from document_automation_spark.kernels.image import encode_png

        png = encode_png(7, 5, 3, bytes((i % 256) for i in range(7 * 5 * 3)))
        assert decode_image(png) == (7, 5)
        # minimal JPEG: SOI + SOF0(h=33, w=77) — dims from the frame header
        import struct
        jpeg = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
                + b"\x08" + struct.pack(">HH", 33, 77) + b"\x01\x11\x00")
        assert decode_image(jpeg) == (77, 33)
        gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 3
        assert decode_image(gif) == (12, 34)
        # malformed PNG-intent payload quarantines via ValueError, never fake
        with pytest.raises(ValueError):
            decode_image(b"\x89PNG", deterministic_fake=True)

    def test_decode_seam_contract(self):
        """Beyond PNG/JPEG/GIF the seam remains: the error message must
        name the dependency and the plug-in point — it's the documented
        integration contract (PIL/cv2 are not installable here)."""
        with pytest.raises(NotImplementedError, match=r"PIL/cv2"):
            decode_image(b"RIFF....WAVE")
        with pytest.raises(NotImplementedError, match=r"plug the real decoder"):
            decode_image(b"")
        # fake path (non-image payloads only): pure function of the bytes
        assert decode_image(b"\x10abc\x20", deterministic_fake=True) == (
            320 + 0x10 * 4,
            240 + 0x20 * 3,
        )

    def test_fake_path_partition_count_invariance(self, spark):
        """Deterministic-fake decode must give identical rows whatever the
        partitioning — the retry/cluster determinism contract."""
        from document_automation_spark.operators.multimodal import media_features

        rows = [
            (f"m{i}", bytearray(bytes([i % 251]) + bytes(range(i % 97)) + bytes([i % 13])))
            for i in range(64)
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        one = media_features(df.coalesce(1)).collect()
        many = media_features(df.repartition(16)).collect()

        def canon(rs):
            return sorted(
                (r.media_id, r.resize_w, r.resize_h, tuple(r.frame_offsets),
                 tuple(r.features), r.error)
                for r in rs
            )

        assert canon(one) == canon(many)

    def test_media_metadata_pipeline(self, spark):
        import struct

        from document_automation_spark.kernels.image import encode_png

        png = encode_png(640, 480, 3, bytes((i % 256) for i in range(640 * 480 * 3)))
        jpeg = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
                + b"\x08" + struct.pack(">HH", 480, 640) + b"\x01\x11\x00")
        rows = [
            ("m1", bytearray(png)),
            ("m2", bytearray(jpeg)),
            ("m3", None),
            ("m4", bytearray(b"\x89PNG\r\n\x1a\nrest")),  # malformed PNG
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        got = {r.media_id: r for r in media_metadata(df).collect()}
        assert got["m1"].media_format == "png"
        assert (got["m1"].width, got["m1"].height) == (640, 480)  # REAL dims
        assert got["m2"].media_format == "jpeg"
        assert (got["m2"].width, got["m2"].height) == (640, 480)
        assert got["m1"].crop_right == int(640 * 0.70)
        assert got["m3"].error is not None
        assert got["m4"].error is not None and "ValueError" in got["m4"].error


class TestMediaFeatures:
    def test_resize_spec_math(self):
        from document_automation_spark.operators.multimodal import resize_spec

        assert resize_spec(1024, 512, 256) == (256, 128)
        assert resize_spec(100, 200, 256) == (100, 200)  # already small
        assert resize_spec(513, 1000, 256) == (131, 256)

    def test_frame_offsets(self):
        from document_automation_spark.operators.multimodal import frame_sample_offsets

        offs = frame_sample_offsets(4096 * 100, bytes_per_frame=4096, max_frames=8)
        assert len(offs) == 8
        assert offs[0] == 0
        assert offs == sorted(offs)
        assert frame_sample_offsets(10) == [0]  # tiny payload → one frame

    def test_feature_vector_normalized(self):
        from document_automation_spark.operators.multimodal import feature_vector

        v = feature_vector(b"\x00\x01\x02\x03" * 100)
        assert len(v) == 8
        assert abs(sum(v) - 1.0) < 1e-3
        assert feature_vector(b"\x00\x01\x02\x03" * 100) == v  # deterministic

    def test_media_features_pipeline(self, spark):
        from document_automation_spark.operators.multimodal import media_features

        from document_automation_spark.kernels.image import encode_png

        png = encode_png(512, 256, 1, bytes((i % 256) for i in range(512 * 256)))
        rows = [("m1", bytearray(png)), ("m2", None)]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        got = {r.media_id: r for r in media_features(df).collect()}
        assert got["m1"].error is None
        # resize spec derives from the REAL decoded dims (512x256 -> 256x128)
        assert (got["m1"].resize_w, got["m1"].resize_h) == (256, 128)
        assert got["m1"].frame_offsets[0] == 0
        assert abs(sum(got["m1"].features) - 1.0) < 1e-3
        assert got["m2"].error is not None


class TestStreamingDedup:
    def test_cross_batch_duplicates_dropped(self, spark, tmp_path):
        """Two file drops with overlapping payloads: the second drop's
        re-crawls must be suppressed by the cross-batch hash state."""
        from document_automation_spark.streaming.pipeline import streaming_dedup_pages

        input_dir = tmp_path / "pages_dedup_in"
        input_dir.mkdir()
        pages = pages_df(spark, 60, partitions=2).cache()
        # drop 1: pages 0..39;  drop 2: pages 20..59 (20..39 are re-crawls)
        pages.filter(F.col("url").rlike("/(\\d|[12]\\d|3\\d)\\.html$")).write.parquet(
            str(input_dir / "drop1")
        )
        pages.filter(F.col("url").rlike("/([2-5]\\d)\\.html$")).write.parquet(
            str(input_dir / "drop2")
        )

        stream = (
            spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(input_dir / "*"))
        )
        deduped = streaming_dedup_pages(stream, watermark="30 days")
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_out")
            .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

        got = spark.sql("SELECT content_hash, count(*) AS n FROM dedup_out GROUP BY 1")
        assert got.filter(F.col("n") > 1).count() == 0  # no hash emitted twice
        n_unique = pages.select(F.sha2(F.col("html"), 256)).distinct().count()
        assert spark.sql("SELECT count(*) FROM dedup_out").first()[0] == n_unique


class TestDenseIdInvariance:
    def test_ids_invariant_to_partitioning(self, spark, sf_dir):
        """Partition-offset id assignment must equal the global row_number
        regardless of input partitioning or requested partition count."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = embed_documents(docs)
        expected = {
            r.doc_id: i
            for i, r in enumerate(sorted(emb.collect(), key=lambda r: r.doc_id))
        }
        for src, n in ((emb.coalesce(1), 1), (emb.repartition(16), 7), (emb, None)):
            got = {
                r.doc_id: r.vector_id
                for r in assign_dense_vector_ids(src, num_partitions=n).collect()
            }
            assert got == expected, n


class TestStreamingLsh:
    def test_cross_batch_pairs_match_batch_operator(self, spark, tmp_path):
        """Near-dup pairs spanning micro-batches: doc A arrives in drop 1,
        its near-dup B in drop 2 — the stateful band buckets must emit the
        pair; the union over batches equals the batch self-join exactly."""
        from document_automation_spark.operators.dedup import minhash_lsh_candidates
        from document_automation_spark.streaming.pipeline import streaming_lsh_candidates

        base = "the quick brown fox jumps over the lazy dog again and again "
        rows = [
            (1, base * 5),
            (2, base * 5),                                # exact dup of 1
            (3, (base * 5).replace("lazy", "tired")),     # near dup of 1/2
            (4, "entirely different text about distributed joins " * 6),
            (5, (base * 5).replace("quick", "rapid")),    # near dup, later drop
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        in_dir = tmp_path / "lsh_in"
        in_dir.mkdir()
        docs.filter(F.col("doc_id") <= 3).coalesce(1).write.parquet(str(in_dir / "d1"))
        docs.filter(F.col("doc_id") >= 4).coalesce(1).write.parquet(str(in_dir / "d2"))

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "*"))
        )
        q = (
            streaming_lsh_candidates(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("lsh_pairs")
            .option("checkpointLocation", str(tmp_path / "ckpt_lsh"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

        streamed = {
            (r.doc_a, r.doc_b)
            for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM lsh_pairs").collect()
        }
        batch = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(docs).collect()}
        assert streamed == batch
        # the doc-5 pairs REQUIRE cross-batch state (its dups are in drop 1)
        assert any(b == 5 for _, b in streamed)


class TestStreamingLshStress:
    """Round-2 verdict #7: streaming LSH at bench scale — ≥50 micro-batches
    with the TTL armed, bounded state, exact batch parity on the union.

    Test mechanics: with a processing-time TTL armed, Spark keeps
    scheduling 'cleaning up state' micro-batches even under
    trigger(availableNow=True) (the query never self-terminates), so these
    tests poll for their completion condition and stop() explicitly."""

    @staticmethod
    def _poll(q, predicate, timeout_s):
        import time as _time

        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            try:
                if predicate():
                    return True
            except Exception:
                # reading the memory sink races the concurrent streaming
                # commit occasionally (planner-phase internal error) —
                # transient, retry on the next tick
                pass
            _time.sleep(0.5)
        return False

    def test_50_micro_batches_bounded_state_batch_parity(self, spark, tmp_path):
        import hashlib as _hashlib
        import time as _time

        from document_automation_spark.operators.dedup import minhash_lsh_candidates
        from document_automation_spark.streaming.pipeline import streaming_lsh_candidates

        # 50 drops × 20 docs; doc i belongs to near-dup family i % 100, so
        # every family accumulates 10 members spread over the whole run —
        # cross-batch pairs are the COMMON case here, not the corner case.
        # Family texts use disjoint md5-gibberish vocabularies: no shared
        # template → no cross-family band collisions → exactly C(10,2)
        # pairs per family.
        n_batches, per_batch = 50, 20
        fam_text = {
            f: " ".join(
                _hashlib.md5(f"fam{f}-w{i}".encode()).hexdigest()[:10]
                for i in range(25)
            )
            for f in range(100)
        }
        all_rows = [
            (b * per_batch + j, fam_text[(b * per_batch + j) % 100])
            for b in range(n_batches)
            for j in range(per_batch)
        ]
        docs = spark.createDataFrame(all_rows, "doc_id long, text string")
        batch_pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(docs).collect()}
        assert len(batch_pairs) == 100 * 45  # 100 families × C(10,2), no cross-family

        in_dir = tmp_path / "stress_in"
        in_dir.mkdir()
        for b in range(n_batches):
            rows = all_rows[b * per_batch : (b + 1) * per_batch]
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
                1
            ).write.parquet(str(in_dir / f"d{b:03d}"))

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "*"))
        )
        # TTL armed (the continuous-run configuration) but far longer than
        # the run, so no eviction perturbs the batch-parity check below.
        # Poll+stop pattern: a TTL-armed query keeps scheduling cleanup
        # batches forever, so processAllAvailable would never return.
        q = (
            streaming_lsh_candidates(stream, state_ttl_minutes=60)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("lsh_stress")
            .option("checkpointLocation", str(tmp_path / "ckpt_stress"))
            .start()
        )
        t0 = _time.time()
        try:
            def all_pairs_arrived():
                n = spark.sql(
                    "SELECT COUNT(DISTINCT struct(doc_a, doc_b)) AS n FROM lsh_stress"
                ).first().n
                return n >= len(batch_pairs)

            assert self._poll(q, all_pairs_arrived, 540), "pairs did not all arrive"
            wall = _time.time() - t0
            progress = q.lastProgress
            # ≥50 genuine micro-batches (maxFilesPerTrigger=1 over 50 drops)
            assert progress["batchId"] >= n_batches - 1
            # bounded state: one state row per ACTIVE band bucket — ≤
            # families × bands (+hash collisions), nowhere near pair count
            state = progress["stateOperators"][0]
            assert state["numRowsTotal"] <= 100 * 8 + 16
        finally:
            q.stop()

        streamed = {
            (r.doc_a, r.doc_b)
            for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM lsh_stress").collect()
        }
        assert streamed == batch_pairs  # exact parity over the union of 50 batches
        print(f"\nstreaming-lsh stress: {len(streamed)} pairs in {wall:.1f}s "
              f"({len(streamed)/wall:.0f} pairs/s), state rows {state['numRowsTotal']}")

    def test_ttl_evicts_idle_buckets(self, spark, tmp_path):
        """Processing-time TTL: a bucket idle past the TTL is evicted and a
        later family member no longer pairs with the evicted members — the
        documented forward-only trade that bounds state at O(arrivals per
        TTL window).  One continuous query: the TTL cleanup loop keeps
        firing micro-batches on its own, so eviction is observed by polling
        numRowsTotal → 0, then new drops are picked up live."""
        from document_automation_spark.streaming.pipeline import streaming_lsh_candidates

        text = "ttl eviction family shares this exact sentence " * 6
        in_dir = tmp_path / "ttl_in"
        in_dir.mkdir()

        def drop(name, rows):
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
                1
            ).write.parquet(str(in_dir / name))

        drop("d0", [(1, text)])
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "*"))
        )
        q = (
            streaming_lsh_candidates(stream, state_ttl_minutes=0.03)  # 1.8 s
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("lsh_ttl")
            .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
            .start()
        )
        try:
            def state_evicted():
                p = q.lastProgress
                return bool(
                    p
                    and p.get("stateOperators")
                    and p["numInputRows"] == 0
                    and p["stateOperators"][0]["numRowsTotal"] == 0
                )

            # once the 1.8 s TTL lapses, doc 1's band buckets get the
            # hasTimedOut call in a cleanup batch and are removed
            assert self._poll(q, state_evicted, 120), "TTL never evicted"

            drop("d1", [(2, text)])
            drop("d2", [(3, text)])

            def got_pair():
                return (
                    spark.sql(
                        "SELECT COUNT(*) AS n FROM lsh_ttl "
                        "WHERE doc_a = 2 AND doc_b = 3"
                    ).first().n
                    > 0
                )

            assert self._poll(q, got_pair, 120), "(2, 3) pair never emitted"
        finally:
            q.stop()

        pairs = {
            (r.doc_a, r.doc_b)
            for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM lsh_ttl").collect()
        }
        assert (1, 2) not in pairs and (1, 3) not in pairs
        assert (2, 3) in pairs


class TestPixelFeatures:
    def test_luma_histogram_from_real_pixels(self):
        """pixel_feature_vector is a true image statistic: a PNG of pure
        black and pure white pixels lands exactly in the first and last
        brightness bands, regardless of compressed byte layout."""
        from document_automation_spark.kernels.image import encode_png
        from document_automation_spark.operators.multimodal import pixel_feature_vector

        px = bytes([0] * 32 + [255] * 32)  # 8x8 gray: half black, half white
        v = pixel_feature_vector(encode_png(8, 8, 1, px))
        assert v[0] == 0.5 and v[-1] == 0.5
        assert sum(v) == 1.0

    def test_media_features_uses_pixels_for_png(self, spark):
        from document_automation_spark.kernels.image import encode_png
        from document_automation_spark.operators.multimodal import media_features

        png = encode_png(8, 8, 1, bytes([0] * 32 + [255] * 32))
        df = spark.createDataFrame([("m1", bytearray(png))], "media_id string, payload binary")
        row = media_features(df).collect()[0]
        assert row.error is None
        assert abs(row.features[0] - 0.5) < 1e-6
        assert abs(row.features[-1] - 0.5) < 1e-6

    def test_corrupt_body_behind_valid_header_falls_back_not_quarantines(self, spark):
        """Round-4 review: zlib.error/IndexError from a malformed body
        must not escape pixel_feature_vector — the row keeps byte-sketch
        features with error=None (dims were decodable)."""
        import struct as _s
        import zlib as _z

        from document_automation_spark.operators.multimodal import (
            media_features,
            pixel_feature_vector,
        )

        def chunk(name, body):
            return (_s.pack(">I", len(body)) + name + body
                    + _s.pack(">I", _z.crc32(name + body) & 0xFFFFFFFF))

        ihdr = _s.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        corrupt = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", b"\x42" * 20) + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="undecodable pixels"):
            pixel_feature_vector(corrupt)
        df = spark.createDataFrame(
            [("m1", bytearray(corrupt))], "media_id string, payload binary"
        )
        row = media_features(df).collect()[0]
        assert row.error is None  # dims fine, features = byte sketch
        assert abs(sum(row.features) - 1.0) < 1e-3

    def test_size_cap_routes_large_payloads_to_sketch(self, spark):
        from document_automation_spark.kernels.image import encode_png
        from document_automation_spark.operators.multimodal import (
            feature_vector,
            media_features,
        )

        png = encode_png(8, 8, 1, bytes([0] * 32 + [255] * 32))
        df = spark.createDataFrame(
            [("m1", bytearray(png))], "media_id string, payload binary"
        )
        row = media_features(df, max_pixel_decode_bytes=10).collect()[0]
        assert row.error is None
        expect = feature_vector(png)  # byte sketch, NOT the luma histogram
        assert all(
            abs(a - b) < 1e-6 for a, b in zip(row.features, expect)
        )
