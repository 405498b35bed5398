"""operators/encoding: UTF-8-as-cp1252 mojibake repair."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from document_automation_spark.operators.encoding import (
    MOJIBAKE_GUARD_CLASS,
    MOJIBAKE_TABLE,
    _repair_alphabet,
    repair_mojibake,
    repair_mojibake_col,
)


class TestTable:
    def test_generated_from_real_codec_roundtrip(self):
        """Every entry is exactly the codec corruption of its repair, and
        every repairable alphabet char is covered (the five cp1252
        unmapped bytes excluded by construction)."""
        covered = set()
        for moji, rep in MOJIBAKE_TABLE:
            assert rep.encode("utf-8").decode("cp1252") == moji
            assert 2 <= len(moji) <= 3  # 2/3-byte UTF-8 only
            covered.add(rep)
        expected = set()
        for ch in _repair_alphabet():
            try:
                ch.encode("utf-8").decode("cp1252")
            except UnicodeDecodeError:
                continue
            expected.add(ch)
        assert covered == expected and len(MOJIBAKE_TABLE) == len(expected)

    def test_no_entry_occurs_inside_another(self):
        """UTF-8 continuation bytes never map to lead chars, so no table
        entry can appear as a substring of a different entry — the fold
        order cannot matter."""
        mojis = [m for m, _ in MOJIBAKE_TABLE]
        for a in mojis:
            for b in mojis:
                if a != b:
                    assert a not in b

    def test_guard_covers_every_entry(self):
        leads = {m[0] for m, _ in MOJIBAKE_TABLE}
        assert leads == set(MOJIBAKE_GUARD_CLASS[1:-1])


class TestRepair:
    def test_randomized_roundtrip_vs_codec(self, spark):
        """200 seeded random strings mixing ASCII and the repair alphabet:
        corrupt with the REAL codec, repair with the Spark expression,
        require the original back byte-for-byte — two implementations,
        one spec (the codec itself is the spec)."""
        rng = random.Random(42)
        alphabet = [
            ch
            for ch in _repair_alphabet()
            if any(r == ch for _, r in MOJIBAKE_TABLE)
        ]
        ascii_words = ["the", "café-less", "word", "42", "—no wait"]
        cases = []
        for i in range(200):
            parts = []
            for _ in range(rng.randint(1, 30)):
                if rng.random() < 0.5:
                    parts.append(rng.choice(alphabet))
                else:
                    parts.append(rng.choice(ascii_words) + " ")
            clean = "".join(parts)
            cases.append((i, clean, clean.encode("utf-8").decode("cp1252")))
        df = spark.createDataFrame(cases, "i long, clean string, text string")
        out = repair_mojibake(df)
        assert out.where(~F.col("text").eqNullSafe(F.col("clean"))).count() == 0
        # every corrupted string that differed from its clean form flags
        flagged = out.where(F.col("was_mojibake")).count()
        changed = sum(1 for _, c, m in cases if c != m)
        assert flagged == changed > 0

    def test_clean_text_untouched_and_unflagged(self, spark):
        rows = [("plain ascii",), ("tabs\tand\nnewlines",), (None,), ("",)]
        df = spark.createDataFrame(rows, "text string")
        out = repair_mojibake(df)
        assert [r.was_mojibake for r in out.collect()] == [False] * 4
        assert [r.text for r in out.collect()] == [r[0] for r in rows]

    def test_idempotent(self, spark):
        corrupted = "donâ€™t cafÃ© â‚¬5 Ã¼ber"
        df = spark.createDataFrame([(corrupted,)], "text string")
        once = repair_mojibake(df).select("text")
        twice = repair_mojibake(once)
        row = twice.first()
        assert row.text == "don’t café €5 über"
        assert row.was_mojibake is False  # second pass is a no-op

    def test_legit_accented_text_passes_through(self, spark):
        """Clean text that CONTAINS guard lead chars (real French/Swedish
        letters) but no full mojibake sequence must survive unchanged —
        the guard admits it to the fold, the fold matches nothing."""
        rows = [("Ã la carte? no: À la carte, Ångström, âme",)]
        # none of these two-char windows form a table entry EXCEPT 'Ã '
        # (A-tilde + space = mojibake of NBSP)?  'Ã' + ' ' is NOT in the
        # table: NBSP mojibake is 'Â\xa0'.  Verify explicitly:
        assert all(m not in rows[0][0] for m, _ in MOJIBAKE_TABLE)
        df = spark.createDataFrame(rows, "text string")
        out = repair_mojibake(df).first()
        assert out.text == rows[0][0] and out.was_mojibake is False

    def test_null_in_null_out(self, spark):
        df = spark.createDataFrame([(None,)], "text string")
        assert repair_mojibake(df).first().text is None

    def test_expression_is_single_jvm_column(self, spark):
        """No Python UDF, no shuffle: the repair plans as a pure projection."""
        df = spark.range(10).select(F.lit("cafÃ©").alias("text"))
        plan = repair_mojibake(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "PythonUDF" not in plan and "mapInPandas" not in plan.lower()


class TestStreamingRepair:
    def test_streaming_repair_matches_batch(self, spark, tmp_path):
        """Mojibake repair on a readStream plan: output rows identical to
        the batch operator, repaired-row counter in observedMetrics."""
        from document_automation_spark.streaming.pipeline import (
            start_streaming_encoding_repair,
        )

        clean = ["It’s a café — über €9", "plain ascii", "naïve «quote» …"]
        rows = [
            (i, c.encode("utf-8").decode("cp1252") if i % 2 == 0 else c)
            for i, c in enumerate(clean)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        input_dir = str(tmp_path / "docs_in")
        output_dir = str(tmp_path / "docs_fixed")
        docs.repartition(2).write.parquet(input_dir)
        q = start_streaming_encoding_repair(
            spark, input_dir, output_dir, str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()
            progress = [
                p.observedMetrics["fix_encoding"]
                for p in q.recentProgress
                if "fix_encoding" in (p.observedMetrics or {})
            ]
        finally:
            q.stop()
        streamed = {
            (r.doc_id, r.text) for r in spark.read.parquet(output_dir).collect()
        }
        batch = repair_mojibake(docs).drop("was_mojibake")
        assert streamed == {(r.doc_id, r.text) for r in batch.collect()}
        # doc 0 and 2 were corrupted and repaired back to clean
        assert dict(streamed)[0] == clean[0]
        assert dict(streamed)[2] == clean[2]
        assert sum(p.n_repaired or 0 for p in progress) == 2


class TestMultiPass:
    def test_generation2_mojibake_needs_two_passes(self, spark):
        """Each pass inverts the outermost corruption generation: gen-2
        text comes back clean with passes=2 and only half-fixed with the
        default single pass."""
        # NOTE: not every char survives two generations — gen-1 of '—'
        # contains '”', whose utf-8 hits cp1252's unmapped 0x9D, so real
        # gen-2 mojibake only exists for chars whose gen-1 images decode
        clean = "It’s a café über €9 «naïve»"
        gen1 = clean.encode("utf-8").decode("cp1252")
        gen2 = gen1.encode("utf-8").decode("cp1252")
        df = spark.createDataFrame([(gen2,)], "text string")
        once = repair_mojibake(df).first()
        assert once.text == gen1 and once.was_mojibake is True
        twice = repair_mojibake(df, passes=2).first()
        assert twice.text == clean and twice.was_mojibake is True
        # fixpoint: extra passes beyond the depth are no-ops
        thrice = repair_mojibake(df, passes=3).first()
        assert thrice.text == clean

    def test_rejects_zero_passes(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError, match="passes"):
            repair_mojibake(df, passes=0)


class TestNulSemantics:
    def test_nul_only_change_not_flagged_as_mojibake(self, spark):
        """A stray NUL is stripped (it is the token sentinel) but that is
        NOT an encoding repair: the text changes, was_mojibake stays
        false, so repair counters never report phantom mojibake."""
        rows = [("clean\x00text",), ("cafÃ© with \x00 nul",)]
        df = spark.createDataFrame(rows, "text string")
        out = {r.text: r.was_mojibake for r in repair_mojibake(df).collect()}
        assert out["cleantext"] is False          # NUL gone, not flagged
        assert out["café with  nul"] is True      # real repair still flags

    def test_streaming_default_matches_batch_stage_depth(self):
        import inspect

        from document_automation_spark.streaming.pipeline import (
            start_streaming_encoding_repair,
        )

        sig = inspect.signature(start_streaming_encoding_repair)
        assert sig.parameters["passes"].default == 2
