"""Streaming ExactSubstr twin (streaming/substr.py) — VERDICT r9 task
#3's 'done' criterion: batch == streaming pair sets across a
micro-batch cut that SPANS a shared run, plus replay idempotence of
the ledger-guarded ingest loop.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from cdc_poc_spark.operators.dedup import common_substring_pairs
from cdc_poc_spark.streaming.substr import (
    batch_substr_hits,
    build_gram_index,
    ingest_substr_stream,
)

from .conftest import SF_DIR


def _drop_index(spark, name):
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    for tbl in (f"{name}_grams", f"{name}_lens", f"{name}_meta", f"{name}_applied"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if wh:
            shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)


def _stage_batches(spark, df, splits, data_dir):
    """Write df (doc_id, text) as one JSON file per split predicate,
    mtime-ordered so maxFilesPerTrigger=1 replays them in order."""
    staged = data_dir + "_staged"
    tagged = df.withColumn(
        "__b",
        F.coalesce(
            *[F.when(p, F.lit(i)) for i, p in enumerate(splits)],
        ),
    )
    tagged.repartition(1).write.partitionBy("__b").json(staged)
    os.makedirs(data_dir, exist_ok=True)
    for i in range(len(splits)):
        files = [
            f
            for f in glob.glob(os.path.join(staged, f"__b={i}", "part-*"))
            if not f.endswith(".crc")
        ]
        (pf,) = files
        dest = os.path.join(data_dir, f"b{i:03d}.json")
        shutil.move(pf, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))


def test_stream_equals_batch_with_cut_spanning_pairs(spark, tmp_path):
    """Fixture corpus, 3 tertiles: tertile 0 builds the index, tertiles
    1 and 2 stream in as two micro-batches. The union of per-epoch hits
    must equal the batch operator's pairs minus index-internal ones —
    and the fixture must actually exercise the cut (at least one hit
    pair with its two docs in DIFFERENT ingest units)."""
    name = "substr_t1"
    _drop_index(spark, name)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    )
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    t1 = (int(mx) + 1) // 3
    build_gram_index(docs.filter(F.col("doc_id") < t1), name)
    data_dir = str(tmp_path / "data")
    _stage_batches(
        spark,
        docs.filter(F.col("doc_id") >= t1),
        [F.col("doc_id") < 2 * t1, F.col("doc_id") >= 2 * t1],
        data_dir,
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(data_dir)
    )
    hits_dir = str(tmp_path / "hits")
    q = ingest_substr_stream(
        stream, name, hits_dir, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(600)
    got_rows = spark.read.schema(
        "id_a long, id_b long, max_shared_span long, n_runs long, epoch int"
    ).parquet(hits_dir).collect()
    got = {(r.id_a, r.id_b): (r.max_shared_span, r.n_runs) for r in got_rows}
    assert len(got) == len(got_rows), "a pair emitted in two epochs"
    batch = {
        (r.id_a, r.id_b): (r.max_shared_span, r.n_runs)
        for r in common_substring_pairs(docs).collect()
        if r.id_b >= t1
    }
    assert got == batch
    # the cut is exercised: some pair joins docs from different units
    def unit(i):
        return 0 if i < t1 else (1 if i < 2 * t1 else 2)

    assert any(unit(a) != unit(b) for a, b in got), (
        "no cut-spanning pair — fixture non-discriminating"
    )
    # and specifically across the two STREAMED batches
    assert any(
        unit(a) == 1 and unit(b) == 2 for a, b in got
    ) or any(unit(a) == 0 for a, b in got)


def test_run_spanning_cut_found_whole(spark, tmp_path):
    """Synthetic: doc 1 (indexed) and doc 10 (second streamed batch)
    share one exact 24-token run; doc 5 (first streamed batch) is
    unrelated. The pair must be found in doc 10's epoch with the FULL
    span — the index side supplies doc 1's positions, so the island
    assembles across the ingest cut."""
    name = "substr_t2"
    _drop_index(spark, name)
    run = " ".join(f"tok{i}" for i in range(24))
    pad_a = " ".join(f"aa{i}" for i in range(10))
    pad_b = " ".join(f"bb{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"{pad_a} {run} {pad_b}"),
            (5, " ".join(f"zz{i}" for i in range(40))),
            (10, f"{pad_b} {run} {pad_a}"),
        ],
        "doc_id long, text string",
    )
    build_gram_index(docs.filter("doc_id = 1"), name)
    data_dir = str(tmp_path / "data")
    _stage_batches(
        spark,
        docs.filter("doc_id > 1"),
        [F.col("doc_id") == 5, F.col("doc_id") == 10],
        data_dir,
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(data_dir)
    )
    hits_dir = str(tmp_path / "hits")
    q = ingest_substr_stream(
        stream, name, hits_dir, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(300)
    rows = spark.read.schema(
        "id_a long, id_b long, max_shared_span long, n_runs long, epoch int"
    ).parquet(hits_dir).collect()
    assert [(r.id_a, r.id_b, r.max_shared_span, r.epoch) for r in rows] == [
        (1, 10, 24, 1)
    ]


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running an already-ledgered batch through batch_substr_hits'
    foreachBatch handle must not re-append index rows or change hits:
    the ledger skips it wholesale."""
    name = "substr_t3"
    _drop_index(spark, name)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 100")
    )
    build_gram_index(docs.filter("doc_id < 50"), name)
    data_dir = str(tmp_path / "data")
    _stage_batches(spark, docs.filter("doc_id >= 50"), [F.lit(True)], data_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(data_dir)
    )
    hits_dir = str(tmp_path / "hits")
    writer = ingest_substr_stream(stream, name, hits_dir, str(tmp_path / "ckpt"))
    q = writer.start()
    q.awaitTermination(300)
    n_grams = spark.table(f"{name}_grams").count()
    n_lens = spark.table(f"{name}_lens").count()
    # replay the SAME data with a fresh checkpoint: batch_id restarts at
    # 0, the ledger already has 0, so the handle must skip everything
    q2 = ingest_substr_stream(
        stream, name, hits_dir, str(tmp_path / "ckpt2")
    ).start()
    q2.awaitTermination(300)
    assert spark.table(f"{name}_grams").count() == n_grams
    assert spark.table(f"{name}_lens").count() == n_lens


@pytest.fixture(autouse=True)
def _cleanup(spark):
    yield
    for name in ("substr_t1", "substr_t2", "substr_t3"):
        _drop_index(spark, name)
