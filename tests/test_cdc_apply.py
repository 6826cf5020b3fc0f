"""Golden tests for the CDC core, re-expressing the reference's manual
CRUD scenarios (reference postgres/scripts/manual/001-003 + seed data,
expected envelope outputs README.md:90-128, FIXTURES.md A2) as
deterministic asserts — replacing the reference's sleep-and-scrape e2e
(test_cdc.py:119-140, SURVEY §5)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_poc_spark.cdc import apply as cdc_apply
from cdc_poc_spark.cdc import envelope as env

ACCOUNT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.IntegerType()),
        T.StructField("email", T.StringType()),
        T.StructField("created_at", T.LongType()),  # Debezium MicroTimestamp
    ]
)

#: golden micros value observed in reference README.md:93
GOLDEN_MICROS = 1713192083639740
GOLDEN_TS_STR = "2024-04-15 14:41:23.639740"


def _env(op, before, after, ts_ms, offset):
    return (
        json.dumps(
            {
                "schema": {"type": "struct"},
                "payload": {
                    "before": before,
                    "after": after,
                    "op": op,
                    "ts_ms": ts_ms,
                    "source": {"db": "cdc", "schema": "commerce", "table": "account"},
                },
            }
        ),
        "cdc.commerce.account",
        offset,
    )


def _row(uid, email):
    return {"user_id": uid, "email": email, "created_at": GOLDEN_MICROS}


@pytest.fixture(scope="module")
def scenario(spark):
    """FIXTURES.md A2: snapshot(3) -> insert(2) -> update(emily->emma)
    -> delete all 5 (manual/003 deletes the whole table)."""
    records = [
        _env("r", None, _row(1, "alice@example.com"), 1000, 0),
        _env("r", None, _row(2, "bob@example.com"), 1000, 1),
        _env("r", None, _row(3, "carol@example.com"), 1000, 2),
        _env("c", None, _row(4, "derek@example.com"), 2000, 3),
        _env("c", None, _row(5, "emily@example.com"), 2000, 4),
        _env("u", _row(5, "emily@example.com"), _row(5, "emma@example.com"), 3000, 5),
    ]
    deletes = [
        _env("d", _row(uid, e), None, 4000, 6 + i)
        for i, (uid, e) in enumerate(
            [
                (1, "alice@example.com"),
                (2, "bob@example.com"),
                (3, "carol@example.com"),
                (4, "derek@example.com"),
                (5, "emma@example.com"),
            ]
        )
    ]
    df = spark.createDataFrame(
        records + deletes, "value string, topic string, offset long"
    )
    return df


def test_micros_golden_roundtrip(spark):
    df = spark.createDataFrame([(GOLDEN_MICROS,)], "us long")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    r = df.select(
        F.date_format(env.micros_to_ts("us"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s"),
        env.ts_to_micros(env.micros_to_ts("us")).alias("back"),
    ).first()
    assert r.s == GOLDEN_TS_STR
    assert r.back == GOLDEN_MICROS


def test_parse_envelope_raw_matches_reference_shape(spark, scenario):
    parsed = env.parse_envelope_raw(scenario)
    assert set(parsed.columns) == {"before", "after", "op", "ts_ms", "topic", "seq"}
    rows = parsed.orderBy("seq").collect()
    # op domain and JSON-string preservation (SURVEY §1.1c: log keeps strings)
    assert [r.op for r in rows[:6]] == ["r", "r", "r", "c", "c", "u"]
    assert all(r.op == "d" for r in rows[6:])
    assert json.loads(rows[5].after)["email"] == "emma@example.com"
    assert json.loads(rows[5].before)["email"] == "emily@example.com"
    assert rows[0].before is None and rows[6].after is None


def test_parse_envelope_typed_flatten_and_cdc_meta(spark, scenario):
    typed = env.parse_envelope_typed(
        scenario, ACCOUNT_SCHEMA, key_cols=("user_id",)
    )
    assert set(typed.columns) == {"user_id", "email", "created_at", "_cdc"}
    rows = typed.orderBy("_cdc.offset").collect()
    # op mapping r/c -> I, u -> U, d -> D (README.md:118 shows I)
    assert [r._cdc.op for r in rows[:6]] == ["I", "I", "I", "I", "I", "U"]
    assert rows[6]._cdc.op == "D"
    # delete rows keep their key from `before` (after is NULL on the wire)
    assert rows[6].user_id == 1
    # routing target matches the Connect SMT pattern cdc.{db}_{table}
    assert rows[0]._cdc.target == "commerce_account"
    assert rows[0]._cdc.key.user_id == 1


@pytest.fixture(scope="module")
def typed_log(spark, scenario):
    t = env.parse_envelope_typed(scenario, ACCOUNT_SCHEMA, key_cols=("user_id",))
    return t.select(
        "user_id", "email", "created_at",
        F.col("_cdc.op").alias("op"), F.col("_cdc.offset").alias("seq"),
    )


def test_apply_through_update_matches_reference_expected_state(spark, typed_log):
    """FIXTURES.md A2 golden: after apply-through-update, 5 rows with
    emma replacing emily."""
    through_update = typed_log.filter("seq <= 5")
    state = cdc_apply.apply_changes(through_update, ["user_id"])
    got = {(r.user_id, r.email) for r in state.collect()}
    assert got == {
        (1, "alice@example.com"),
        (2, "bob@example.com"),
        (3, "carol@example.com"),
        (4, "derek@example.com"),
        (5, "emma@example.com"),
    }


def test_apply_full_log_is_empty(spark, typed_log):
    """After the whole-table delete (manual/003), current state is empty."""
    assert cdc_apply.apply_changes(typed_log, ["user_id"]).count() == 0


def test_incremental_merge_equals_full_apply(spark, typed_log):
    """merge_upsert batch-by-batch == apply_changes over the whole log
    (the foreachBatch invariant)."""
    full = cdc_apply.apply_changes(typed_log.filter("seq <= 5"), ["user_id"])
    b1 = typed_log.filter("seq <= 2")
    b2 = typed_log.filter("seq BETWEEN 3 AND 5")
    state = cdc_apply.merge_upsert(None, b1, ["user_id"])
    state = cdc_apply.merge_upsert(state, b2, ["user_id"])
    assert sorted((r.user_id, r.email) for r in state.collect()) == sorted(
        (r.user_id, r.email) for r in full.collect()
    )


def test_merge_is_idempotent_under_redelivery(spark, typed_log):
    """Re-applying an already-applied batch must not change state
    (foreachBatch re-delivery after recovery, SURVEY §7 hard parts)."""
    b1 = typed_log.filter("seq <= 4")
    b2 = typed_log.filter("seq = 5")
    s1 = cdc_apply.merge_upsert(None, b1, ["user_id"])
    s2 = cdc_apply.merge_upsert(s1, b2, ["user_id"])
    s3 = cdc_apply.merge_upsert(s2, b2, ["user_id"])  # redelivered
    s2r = sorted((r.user_id, r.email) for r in s2.collect())
    assert sorted((r.user_id, r.email) for r in s3.collect()) == s2r
    # stale redelivery of an OLD batch must not regress newer state
    s4 = cdc_apply.merge_upsert(s3, b1, ["user_id"])
    assert sorted((r.user_id, r.email) for r in s4.collect()) == s2r


def test_merge_into_parquet_roundtrip(spark, typed_log, tmp_path):
    target = str(tmp_path / "mirror")
    cdc_apply.merge_into_parquet(spark, target, typed_log.filter("seq <= 2"), ["user_id"])
    cdc_apply.merge_into_parquet(
        spark, target, typed_log.filter("seq BETWEEN 3 AND 5"), ["user_id"]
    )
    state = spark.read.parquet(target)
    assert {(r.user_id, r.email) for r in state.collect()} == {
        (1, "alice@example.com"),
        (2, "bob@example.com"),
        (3, "carol@example.com"),
        (4, "derek@example.com"),
        (5, "emma@example.com"),
    }
    cdc_apply.merge_into_parquet(spark, target, typed_log.filter("seq >= 6"), ["user_id"])
    assert spark.read.parquet(target).count() == 0


def test_schema_evolution_merge(spark, typed_log):
    """A batch with a new column merges; old state rows get NULL —
    mergeSchema/accept-any-schema semantics (consumer.py:76-78)."""
    b1 = typed_log.filter("seq <= 2")
    b2 = typed_log.filter("seq BETWEEN 3 AND 5").withColumn(
        "plan", F.lit("premium")
    )
    state = cdc_apply.merge_upsert(None, b1, ["user_id"])
    state = cdc_apply.merge_upsert(state, b2, ["user_id"])
    assert "plan" in state.columns
    by_id = {r.user_id: r.plan for r in state.collect()}
    assert by_id[4] == "premium" and by_id[1] is None


def test_scd2_history(spark, typed_log):
    hist = cdc_apply.scd2_from_log(typed_log, ["user_id"])
    emily = hist.filter("user_id = 5").orderBy("valid_from").collect()
    assert len(emily) == 2
    assert emily[0].email == "emily@example.com" and emily[0].valid_to == 5
    assert emily[1].email == "emma@example.com" and emily[1].valid_to == 10  # closed by delete
    assert not emily[1].is_current


def test_merge_into_parquet_bucketed(spark, tmp_path):
    """Bucketed merge: correct state across batches, only touched bucket
    dirs rewritten, all-deleted buckets removed."""
    import os

    target = str(tmp_path / "state")
    schema = "pk LONG, val STRING, seq LONG, op STRING"
    b1 = spark.createDataFrame(
        [(i, f"v{i}", i, "c") for i in range(20)], schema
    )
    cdc_apply.merge_into_parquet_bucketed(spark, target, b1, ["pk"], n_buckets=8)
    got = {(r.pk, r.val) for r in cdc_apply.read_bucketed_state(spark, target).collect()}
    assert got == {(i, f"v{i}") for i in range(20)}

    dirs_before = {
        d: os.path.getmtime(os.path.join(target, d)) for d in os.listdir(target)
    }
    # batch 2 touches exactly one key -> at most one bucket rewritten
    b2 = spark.createDataFrame([(3, "v3b", 100, "u")], schema)
    cdc_apply.merge_into_parquet_bucketed(spark, target, b2, ["pk"], n_buckets=8)
    got = {(r.pk, r.val) for r in cdc_apply.read_bucketed_state(spark, target).collect()}
    assert (3, "v3b") in got and len(got) == 20
    changed = [
        d
        for d in os.listdir(target)
        if d.startswith("__bucket=")
        and os.path.getmtime(os.path.join(target, d)) != dirs_before.get(d)
    ]
    assert len(changed) == 1, changed

    # batch 3 deletes every key of one bucket -> its directory disappears
    bucket_of_3 = changed[0]
    same_bucket_keys = [
        r.pk
        for r in cdc_apply.read_bucketed_state(spark, target)
        .withColumn("b", F.expr("pmod(xxhash64(cast(pk as string)), 8)"))
        .filter(F.expr(f"b = {bucket_of_3.split('=')[1]}"))
        .collect()
    ]
    b3 = spark.createDataFrame(
        [(pk, None, 200 + pk, "d") for pk in same_bucket_keys], schema
    )
    cdc_apply.merge_into_parquet_bucketed(spark, target, b3, ["pk"], n_buckets=8)
    assert not os.path.exists(os.path.join(target, bucket_of_3))
    got = {r.pk for r in cdc_apply.read_bucketed_state(spark, target).collect()}
    assert got == set(range(20)) - set(same_bucket_keys)


def test_merge_sql_statement_shape():
    """The resolved form of the reference's `TODO: Switch to MERGE INTO`
    (consumer.py:76): clause ORDER is delete -> update -> insert, all
    seq-guarded, so stale/replayed rows no-op."""
    sql = cdc_apply.merge_sql("cat.db.mirror", "src", ["pk", "region"])
    assert "MERGE INTO cat.db.mirror t USING src s" in sql
    assert "ON t.pk = s.pk AND t.region = s.region" in sql
    i_del, i_upd, i_ins = (
        sql.index("THEN DELETE"), sql.index("THEN UPDATE"), sql.index("THEN INSERT")
    )
    assert i_del < i_upd < i_ins
    assert sql.count("s.seq >= t.seq") == 2  # delete + update both guarded
    assert "WHEN NOT MATCHED AND s.op NOT IN ('d', 'D') THEN INSERT *" in sql


def test_merge_sql_golden_string():
    """Byte-exact golden for the generated MERGE statement (VERDICT r2
    #6): with no Delta/Iceberg jar loadable in this container the SQL
    path cannot execute, so the emitted text itself is pinned — any
    drift in clause order, seq guards, or delete-op quoting fails here
    rather than silently on a cluster."""
    got = cdc_apply.merge_sql("iceberg.cdc.commerce_account", "batch", ["user_id"])
    golden = (
        "MERGE INTO iceberg.cdc.commerce_account t USING batch s "
        "ON t.user_id = s.user_id "
        "WHEN MATCHED AND s.op IN ('d', 'D') AND s.seq >= t.seq THEN DELETE "
        "WHEN MATCHED AND s.seq >= t.seq THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.op NOT IN ('d', 'D') THEN INSERT *"
    )
    assert got == golden
    got2 = cdc_apply.merge_sql(
        "m", "v", ["a", "b"], seq_col="lsn", op_col="kind", delete_ops=("D",)
    )
    golden2 = (
        "MERGE INTO m t USING v s ON t.a = s.a AND t.b = s.b "
        "WHEN MATCHED AND s.kind IN ('D') AND s.lsn >= t.lsn THEN DELETE "
        "WHEN MATCHED AND s.lsn >= t.lsn THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.kind NOT IN ('D') THEN INSERT *"
    )
    assert got2 == golden2


def test_merge_into_dispatcher_falls_back_to_bucketed(spark, typed_log, tmp_path):
    """No Delta/Iceberg jar in this container -> detect returns None and
    merge_into takes the bucketed-parquet path with identical semantics."""
    assert cdc_apply.detect_merge_backend(spark) is None
    target = str(tmp_path / "mirror")
    cdc_apply.merge_into(spark, target, typed_log.filter("seq <= 2"), ["user_id"], n_buckets=4)
    cdc_apply.merge_into(
        spark, target, typed_log.filter("seq BETWEEN 3 AND 5"), ["user_id"], n_buckets=4
    )
    state = cdc_apply.read_bucketed_state(spark, target)
    assert {(r.user_id, r.email) for r in state.collect()} == {
        (1, "alice@example.com"),
        (2, "bob@example.com"),
        (3, "carol@example.com"),
        (4, "derek@example.com"),
        (5, "emma@example.com"),
    }
    import os
    assert any(d.startswith("__bucket=") for d in os.listdir(target))


def test_merge_into_transactional_live(spark, typed_log, tmp_path):
    """Runs the REAL SQL MERGE when a transactional format is present;
    skipped where neither Delta nor Iceberg is on the classpath (this
    container) — the statement itself is verified by
    test_merge_sql_statement_shape and the dispatcher by the fallback
    test."""
    backend = cdc_apply.detect_merge_backend(spark)
    if backend is None:
        pytest.skip("no transactional table format on the classpath")
    name = "default.cdc_merge_live_test"
    fmt = "delta" if backend == "delta" else "iceberg"
    typed_log.filter("seq <= 2").writeTo(name).using(fmt).createOrReplace()
    cdc_apply.merge_into_transactional(
        spark, name, typed_log.filter("seq BETWEEN 3 AND 5"), ["user_id"]
    )
    got = {(r.user_id, r.email) for r in spark.read.table(name).collect()}
    assert (5, "emma@example.com") in got and len(got) == 5
    spark.sql(f"DROP TABLE {name}")
