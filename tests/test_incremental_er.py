"""Incremental (foreachBatch) entity resolution: cross-batch attachment,
assignment completeness, pairwise F1 parity with the batch pipeline, and
replay tolerance."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def er_fixture(spark, tmp_path_factory):
    """Two deterministic page batches + ground truth, resolved incrementally."""
    from indian_address_parser_spark.sources.pages import generate
    from indian_address_parser_spark.streaming.incremental_er import process_batch

    data = generate(spark, n_households=300)
    pages = data["pages"].cache()
    half = F.crc32(F.col("url")) % 2
    batches = [pages.where(half == i) for i in (0, 1)]

    base = tmp_path_factory.mktemp("incr_er")
    state, asg = str(base / "state"), str(base / "assign")
    for i, b in enumerate(batches):
        process_batch(b, i, state, asg)
    return {
        "pages": pages,
        "batches": batches,
        "truth": data["truth"],
        "labeled_pairs": data["labeled_pairs"],
        "state": state,
        "assignments": asg,
    }


class TestIncrementalEr:
    def test_every_mention_assigned_exactly_once(self, spark, er_fixture):
        from indian_address_parser_spark.operators.extract import extract_mentions

        got = spark.read.parquet(er_fixture["assignments"])
        n_mentions = extract_mentions(er_fixture["pages"]).count()
        assert got.count() == n_mentions
        assert got.select("mention_id").distinct().count() == n_mentions

    def test_batch2_attaches_to_batch1_clusters(self, spark, er_fixture):
        """The point of the operator: later-batch mentions of an already
        seen entity must reuse the stored cluster, not fork a new one."""
        got = spark.read.parquet(er_fixture["assignments"])
        b0_mentions = got.where(F.col("batch_id") == 0).select("mention_id")
        reused = (
            got.where(F.col("batch_id") == 1)
            .join(
                b0_mentions.withColumnRenamed("mention_id", "cluster_id"),
                "cluster_id",
                "left_semi",
            )
            .count()
        )
        assert reused > 0, "no cross-batch attachment happened"

    def test_pairwise_f1_matches_batch_standard(self, spark, er_fixture):
        """Incremental resolution meets the same F1 bar as the batch
        pipeline on the planted ground truth (clean synthetic data: the
        first-rep-wins approximation loses nothing here)."""
        from indian_address_parser_spark.eval.pairwise import pairwise_scores

        got = spark.read.parquet(er_fixture["assignments"]).select(
            "mention_id", "cluster_id"
        )
        scores = pairwise_scores(got, er_fixture["labeled_pairs"])
        assert scores["f1"] == 1.0, scores

    def test_replay_does_not_fork_clusters(self, spark, er_fixture, tmp_path):
        """Re-delivering a batch (foreachBatch's failure mode) appends
        duplicate rows but cannot change any mention's cluster."""
        from indian_address_parser_spark.streaming.incremental_er import (
            process_batch,
        )

        state, asg = str(tmp_path / "state"), str(tmp_path / "assign")
        b0, b1 = er_fixture["batches"]
        process_batch(b0, 0, state, asg)
        process_batch(b0, 0, state, asg)  # replay batch 0
        process_batch(b1, 1, state, asg)
        got = spark.read.parquet(asg)
        per_mention = got.groupBy("mention_id").agg(
            F.count_distinct("cluster_id").alias("n")
        )
        assert per_mention.where(F.col("n") > 1).count() == 0
        # and the final partition is identical to the no-replay run
        ref = spark.read.parquet(er_fixture["assignments"]).select(
            "mention_id", "cluster_id"
        )
        assert (
            got.select("mention_id", "cluster_id")
            .distinct()
            .exceptAll(ref)
            .count()
            == 0
        )

    def test_streaming_wiring_availablenow(self, spark, er_fixture, tmp_path):
        """End-to-end through writeStream.foreachBatch: file-source stream,
        one file per trigger, availableNow — same assignment count."""
        from indian_address_parser_spark.streaming.incremental_er import (
            run_incremental_er,
        )

        src = tmp_path / "pages_stream"
        for i, b in enumerate(er_fixture["batches"]):
            b.coalesce(1).write.parquet(str(src / f"batch_{i}.parquet"))
        stream = (
            spark.readStream.schema(er_fixture["pages"].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*.parquet")
        )
        q = run_incremental_er(
            stream,
            str(tmp_path / "state"),
            str(tmp_path / "assign"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(300)
        got = spark.read.parquet(str(tmp_path / "assign"))
        ref = spark.read.parquet(er_fixture["assignments"])
        assert got.count() == ref.count()
        assert got.select("mention_id").distinct().count() == ref.count()
