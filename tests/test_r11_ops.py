"""Unit tests for the round-11 operators: multi-scale substring dedup
and the contamination-direction audit. Value parity against the DuckDB
oracles is covered by tests/test_oracle_parity.py (every registered
query); these pin the operator-level edge cases the gate data can't
exercise."""

from __future__ import annotations


class TestSubstringMultiscale:
    def test_short_vs_long_duplication_separates(self, spark, tmp_path):
        """A 40-char snippet shared between docs duplicates every
        32-window that fits inside it but NO 64-window; a 100-char
        shared run duplicates windows at both scales."""
        snippet = "x" * 40
        longrun = "".join(chr(97 + (i * 7) % 26) for i in range(100))
        rows = [
            (1, snippet + "." + "a" * 60),
            (2, snippet + "," + "b" * 60),
            (3, longrun + "!" + "c" * 10),
            (4, longrun + "?" + "d" * 10),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
        from protarrow_spark.queries.pipeline import dedup_substring_multiscale

        out = {
            (r["window_len"], r["doc_id"]): r
            for r in dedup_substring_multiscale(spark, str(tmp_path)).collect()
        }
        # doc 1/2: the shared 40-char snippet holds 40-32+1 = 9
        # duplicated 32-windows ('x'*32 is ONE distinct window text,
        # but 9 positions land on it), zero 64-windows
        assert out[(32, 1)]["n_dup_windows"] == 9
        assert out[(64, 1)]["n_dup_windows"] == 0
        # doc 3/4: the 100-char shared run holds 100-32+1 = 69
        # duplicated 32-positions and 100-64+1 = 37 duplicated
        # 64-positions
        assert out[(32, 3)]["n_dup_windows"] == 69
        assert out[(64, 3)]["n_dup_windows"] == 37
        # every (scale, doc) row is present with sane totals
        for (ln, _), r in out.items():
            assert r["n_windows"] >= r["n_dup_windows"] >= 0
            assert 0 <= r["dup_millis"] <= 1000

    def test_doc_between_scales_only_in_short(self, spark, tmp_path):
        # a 50-char doc has 32-windows but no 64-window -> appears
        # only at the short scale
        df = spark.createDataFrame([(1, "z" * 50)], ["doc_id", "text"])
        df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
        from protarrow_spark.queries.pipeline import dedup_substring_multiscale

        rows = dedup_substring_multiscale(spark, str(tmp_path)).collect()
        assert {r["window_len"] for r in rows} == {32}


class TestSubstringSampled:
    def test_stride_detects_long_runs_and_counts_sampled_positions(
        self, spark, tmp_path
    ):
        """stride s detects every duplicated run >= window + s - 1;
        n_windows counts SAMPLED alignments only."""
        run = "".join(chr(97 + (i * 5) % 26) for i in range(40))  # 40 >= 32+4-1
        rows = [
            (1, run + "#" + "a" * 27),  # len 68
            (2, run + "%" + "b" * 27),
            (3, "q" * 68),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
        from protarrow_spark.queries.pipeline import (
            SUBSTRING_STRIDE,
            dedup_substring_windows_sampled,
        )

        assert SUBSTRING_STRIDE == 4
        out = {
            r["doc_id"]: r
            for r in dedup_substring_windows_sampled(spark, str(tmp_path)).collect()
        }
        # 68 chars -> (68-32) div 4 + 1 = 10 sampled alignments
        assert out[1]["n_windows"] == 10
        # sampled starts 1,5,9 fall inside the shared 40-char run
        # (start <= 40-32+1 = 9): exactly 3 duplicated sampled windows
        assert out[1]["n_dup_windows"] == 3
        assert out[2]["n_dup_windows"] == 3
        assert out[3]["n_dup_windows"] == 0


class TestLabelKnnConsistency:
    def test_planted_label_flip_is_suspect(self, spark, tmp_path):
        """Two tight same-label clusters + one vector whose label was
        flipped: the flipped vector's kNN majority disagrees ->
        suspect; its cluster-mates stay majority-consistent."""
        import numpy as np

        # the audit buckets on the SIGNS of the first 5 components, so
        # each cluster keeps a constant sign pattern there
        rng = [
            # cluster A: first five components all positive, label 0
            *[(i, [1.0 + 0.01 * i, 1.0, 1.0, 0.5, 0.5, 0.1 * (i % 3), 0.0, 0.0], 0)
              for i in range(6)],
            # one A-located vector mislabeled as 1 — id 6
            (6, [1.0, 1.0, 1.05, 0.5, 0.45, 0.05, 0.0, 0.0], 1),
            # cluster B: first five components all negative, label 1
            *[(7 + i,
               [-1.0 - 0.01 * i, -1.0, -1.0, -0.5, -0.5, 0.1 * (i % 3), 0.0, 0.0],
               1)
              for i in range(6)],
        ]
        df = spark.createDataFrame(
            [(i, [float(x) for x in v], lbl) for i, v, lbl in rng],
            ["vec_id", "embedding", "label"],
        )
        df.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
        from protarrow_spark.queries.pipeline import dq_label_knn_consistency

        out = {
            r["vec_id"]: r
            for r in dq_label_knn_consistency(spark, str(tmp_path)).collect()
        }
        # the mislabeled vector shares a sign bucket with cluster A
        # (all-positive leading components), so its neighbors are all
        # label 0 -> fully suspect
        assert out[6]["n_same_label"] == 0
        assert out[6]["suspect"] is True
        assert out[6]["agree_millis"] == 0
        # a genuine cluster-A member sees at most one disagreeing
        # neighbor (the flipped one) among its 5
        assert out[0]["n_same_label"] >= 4
        assert out[0]["suspect"] is False
        # cluster B is in the opposite sign bucket: no cross-cluster
        # candidates, full agreement
        assert out[8]["agree_millis"] == 1000


class TestContaminationDirection:
    def test_asymmetry(self, spark, tmp_path):
        """An eval doc quoted verbatim inside a much larger train doc:
        eval_gram_in_train containment is total (1000 millis) while
        the train doc's own containment stays low."""
        eval_text = "alpha beta gamma delta epsilon"  # doc 0 (0 % 20 == 0)
        filler = " ".join(f"w{i}" for i in range(100))
        rows = [
            (0, eval_text),
            (1, filler + " " + eval_text),  # train doc quoting the benchmark
            (2, "unrelated text entirely here"),  # clean train doc
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
        from protarrow_spark.queries.pipeline import (
            report_contamination_direction,
        )

        out = {
            (r["direction"], r["doc_id"]): r
            for r in report_contamination_direction(spark, str(tmp_path)).collect()
        }
        ev = out[("eval_gram_in_train", 0)]
        # every eval 3-gram occurs in train doc 1
        assert ev["n_shared"] == ev["n_grams"]
        assert ev["containment_millis"] == 1000
        tr = out[("train_gram_in_eval", 1)]
        # the quoting train doc shares only the quoted grams: 3 of
        # its ~99 grams (the 3-grams fully inside the quoted span;
        # boundary grams straddle filler+quote and don't match)
        assert 0 < tr["n_shared"] < tr["n_grams"]
        assert tr["containment_millis"] < 200
        # the clean train doc emits NO train-direction row
        assert ("train_gram_in_eval", 2) not in out
        # eval docs are reported even when... (doc 0 is the only one)
        assert ("eval_gram_in_train", 0) in out

    def test_clean_eval_doc_reports_zero(self, spark, tmp_path):
        rows = [(0, "alpha beta gamma delta"), (1, "completely different words")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
        from protarrow_spark.queries.pipeline import (
            report_contamination_direction,
        )

        rows_out = report_contamination_direction(spark, str(tmp_path)).collect()
        ev = [r for r in rows_out if r["direction"] == "eval_gram_in_train"]
        assert len(ev) == 1
        assert ev[0]["n_shared"] == 0
        assert ev[0]["containment_millis"] == 0
        assert not [r for r in rows_out if r["direction"] == "train_gram_in_eval"]
