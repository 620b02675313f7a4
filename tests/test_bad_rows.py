"""Bad-row policy: fail-before-commit vs dead-letter-and-continue
(ref: AGO error-row sink, ago/ago.py:319-344)."""

import glob

import pyspark.sql.functions as F
import pytest

from cityofphiladelphia_databridge_etl_tools_spark import changegen
from cityofphiladelphia_databridge_etl_tools_spark.changegen import TRANSCRIPT_SCHEMA
from cityofphiladelphia_databridge_etl_tools_spark.lake import LakeTable
from tests.test_lake_merge import assert_df_equal


def _with_bad(spark, stream):
    """Corrupt every 10th event: invalid op; one null-key row."""
    bad_op = F.when(F.col("lsn") % 10 == 0, F.lit("X")).otherwise(F.col("op"))
    return stream.withColumn("op", bad_op)


def test_fail_policy_aborts_before_commit(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4,
    )
    stream = _with_bad(spark, changegen.changes(spark, 500, seed=61))
    with pytest.raises(ValueError, match="invalid rows"):
        t.merge_batch(stream, "b-bad")
    # nothing committed: log empty, table empty, replay with clean data works
    assert t.manifest.commits == []
    assert t.read().count() == 0
    clean = changegen.changes(spark, 500, seed=61)
    t.merge_batch(clean, "b-bad")  # same batch id — never committed, so applies
    assert_df_equal(t.read(), changegen.expected_final_state(clean))


def test_dead_letter_policy_continues(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4,
    )
    stream = changegen.changes(spark, 500, seed=62)
    corrupted = _with_bad(spark, stream)
    rec = t.merge_batch(corrupted, "b1", on_bad_rows="dead_letter")
    assert rec is not None
    assert rec.rows_in == 450  # 50 corrupted rows excluded from lineage
    # final state == replay of only the good rows
    good = stream.filter(F.col("lsn") % 10 != 0)
    assert_df_equal(t.read(), changegen.expected_final_state(good))
    # the bad rows landed in the table's _errors/ dead-letter dir
    err_files = glob.glob(str(tmp_path / "t" / "_errors" / "*"))
    assert err_files
    captured = spark.read.parquet(err_files[0])
    assert captured.count() == 50
    assert "_error" in captured.columns


def _mk_rows(spark, n=2000):
    return (
        spark.range(0, n)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .repartition(4)
    )


def test_reliable_delivery_at_least_once_exact_final_count(spark, tmp_path):
    """VERDICT r4 #5 (ref ago/ago.py:716-931 retry + count-reconcile):
    under ~30% injected transient sink failure — including failures
    AFTER the receiver stored the batch (lost ack, the doubled-up-count
    case) — the wrapper retries with the SAME content token, so the
    wire is at-least-once and a token-deduping receiver lands at the
    exact final count."""
    import hashlib
    import json
    import os

    recv_dir = str(tmp_path / "recv")
    attempts_dir = str(tmp_path / "attempts")
    os.makedirs(recv_dir)
    os.makedirs(attempts_dir)

    from cityofphiladelphia_databridge_etl_tools_spark.sources.sinks import (
        deliver_batched_reliable,
    )

    def flaky_send(rows, token):
        # attempt number reconstructed from marker files (workers are
        # separate processes; the FS is the shared medium)
        n_prev = len([f for f in os.listdir(attempts_dir) if f.startswith(token)])
        open(os.path.join(attempts_dir, f"{token}-{n_prev}"), "w").close()
        h = int(hashlib.md5(token.encode()).hexdigest(), 16) % 100
        if h < 15 and n_prev == 0:
            # transient failure BEFORE the receiver saw anything
            raise RuntimeError("transient 503")
        # receiver stores idempotently on token
        with open(os.path.join(recv_dir, token), "w") as f:
            json.dump(rows, f, default=str)
        if 15 <= h < 30 and n_prev == 0:
            # stored but the ACK was lost — the doubled-up case: the
            # retry will resend the SAME token and overwrite in place
            raise RuntimeError("ack lost after store")

    df = _mk_rows(spark)
    stats = deliver_batched_reliable(df, flaky_send, batch_size=100, max_retries=5)

    assert stats["failed_rows"] == 0
    assert stats["sent_rows"] == 2000  # exact reconciliation ledger
    assert stats["batches"] == 20
    # duplicates happened on the wire (ack-lost batches were sent twice) ...
    assert stats["attempts"] > stats["batches"]
    assert stats["retried_batches"] >= 1
    # ... but the token-deduping receiver holds every row EXACTLY once
    received = []
    for name in os.listdir(recv_dir):
        with open(os.path.join(recv_dir, name)) as f:
            received += json.load(f)
    assert sorted(r["id"] for r in received) == list(range(2000))


def test_reliable_delivery_dead_letters_exhausted_batches(spark, tmp_path):
    """Batches that exhaust the retry budget land in the dead-letter
    sink with _error/_token and the pipeline CONTINUES; sent + failed
    reconciles to the input exactly, and received ∪ dead-lettered is a
    partition of the input rows."""
    import hashlib
    import json
    import os

    recv_dir = str(tmp_path / "recv2")
    os.makedirs(recv_dir)

    from cityofphiladelphia_databridge_etl_tools_spark.sources.sinks import (
        deliver_batched_reliable,
    )

    def permafail_send(rows, token):
        if int(hashlib.md5(token.encode()).hexdigest(), 16) % 5 == 0:
            raise RuntimeError("permanent 502")  # every attempt fails
        with open(os.path.join(recv_dir, token), "w") as f:
            json.dump(rows, f, default=str)

    df = _mk_rows(spark)
    stats = deliver_batched_reliable(
        df, permafail_send, batch_size=100, max_retries=3,
        dead_letter_base=str(tmp_path / "dl"),
    )

    assert stats["failed_rows"] > 0
    assert stats["sent_rows"] + stats["failed_rows"] == 2000
    # every failed batch burned its whole retry budget
    assert stats["attempts"] >= stats["batches"] + (stats["failed_rows"] // 100) * 2

    dead = spark.read.parquet(stats["dead_letter_path"])
    assert dead.count() == stats["failed_rows"]
    assert {"_error", "_token"} <= set(dead.columns)
    assert dead.filter(F.col("_error").contains("permanent 502")).count() == dead.count()

    received = []
    for name in os.listdir(recv_dir):
        with open(os.path.join(recv_dir, name)) as f:
            received += json.load(f)
    got = sorted(r["id"] for r in received) + [r["id"] for r in dead.collect()]
    assert sorted(got) == list(range(2000))


def test_identical_content_batches_get_distinct_tokens(spark, tmp_path):
    """ADVICE r5 (medium): two DISTINCT batches with byte-identical
    serialized content (duplicate rows in a CDC feed filling multiple
    full batches) must carry DIFFERENT idempotency tokens — a
    token-deduping receiver must keep both batches' rows, and the
    ledger must still reconcile exactly."""
    import json
    import os

    recv_dir = str(tmp_path / "recv3")
    os.makedirs(recv_dir)

    from cityofphiladelphia_databridge_etl_tools_spark.sources.sinks import (
        deliver_batched_reliable,
    )

    def store_send(rows, token):
        # token-deduping receiver: last write per token wins
        with open(os.path.join(recv_dir, token), "w") as f:
            json.dump(rows, f, default=str)

    # 1000 byte-identical rows in ONE partition -> 10 batches of 100
    # whose serialized content is identical across batches
    df = (
        spark.range(1000)
        .select(F.lit(7).alias("id"), F.lit("same-payload").alias("payload"))
        .repartition(1)
    )
    stats = deliver_batched_reliable(df, store_send, batch_size=100, max_retries=2)

    assert stats["failed_rows"] == 0
    assert stats["sent_rows"] == 1000
    assert stats["batches"] == 10
    # 10 distinct tokens on disk, 100 rows each: nothing collapsed
    files = os.listdir(recv_dir)
    assert len(files) == 10
    total = 0
    for name in files:
        with open(os.path.join(recv_dir, name)) as f:
            total += len(json.load(f))
    assert total == 1000
