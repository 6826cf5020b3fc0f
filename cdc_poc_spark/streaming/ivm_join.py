"""Incremental view maintenance for JOINS: keep ``left JOIN right ON
join_key`` current under CDC deltas to BOTH sides, without ever
re-joining the full tables.

ContinuousAggregate (ivm.py) maintains an aggregate; this maintains a
JOIN VIEW — the other half of what a "materialized view" engine offers.
The reference has neither (its Iceberg consumers re-join per query);
this is engine surface added per the brief.

Delta-key maintenance: an equi-join row can only change when its join
key's slice of either side changes, so per micro-batch the view is
recomputed ONLY for the join keys the batch touches:

    affected = jk(delta_left) ∪ jk(delta_right)
    V_new[affected]   = L_new[affected] ⋈ R_new[affected]
    V_new[~affected]  = V_old[~affected]        (no I/O — see manifest)

Bucket manifest (the scale design): state and view are hash-bucketed by
join key (``__bkt = pmod(xxhash64(jk), n_buckets)``). Each committed
VERSION directory holds parquet for the buckets that batch touched;
``meta.json`` maps every bucket to the version that last wrote it
(an Iceberg-snapshot-style manifest, reimplemented from the published
idea on plain parquet — no table-format jar needed). Readers compose
each side as the union of per-bucket current locations; untouched
buckets are never copied forward, so per-batch I/O is
O(delta + affected buckets), not O(state).

Exactly-once: the manifest (bucket pointers + applied-epoch set) and
the bucket data COMMIT ATOMICALLY via the same CURRENT-pointer
``os.replace`` protocol as ContinuousAggregate. A crash before the
pointer swap leaves every bucket pointing at its old version and the
epoch unrecorded — replay recomputes from consistent state.

Contract (documented constraint, the same one Kafka Streams KTable
joins and most MV engines impose): the JOIN KEY is part of a row's
identity — a "key move" must be expressed as delete(old jk) +
insert(new jk). Without it, finding a moved row's old bucket would be
an O(state) scan per batch. Delta rows carry ``__op`` ('u' upsert /
'd' delete) and a ``__seq`` long; last writer (max __seq, ties to 'd')
wins per key, matching the CDC mirror's semantics.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


class MaterializedJoin:
    """Maintains ``left ⋈ right ON left[join_key] = right[join_key]``
    (inner equi-join) under two-sided CDC deltas.

    ``left_id``: the left row identity column (e.g. order key).
    ``join_key``: the equi-join column, present on both sides and on
    every delta row (deletes included — it addresses the bucket).
    Right rows are identified BY the join key (the dimension shape);
    a many-to-many right side would carry its own ``right_id`` — the
    maintenance algebra is unchanged, only the merge key differs."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        left_id: str,
        join_key: str,
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.left_id = left_id
        self.join_key = join_key
        self.n_buckets = n_buckets
        os.makedirs(state_dir, exist_ok=True)

    # -- manifest / versioned state (atomic commit via CURRENT) --------

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, "CURRENT")

    def _current_version(self) -> int | None:
        if not os.path.exists(self._pointer_path):
            return None
        return int(open(self._pointer_path).read().strip())

    def _vdir(self, version: int) -> str:
        return os.path.join(self.state_dir, f"v{version}")

    def _manifest(self, version: int | None) -> dict:
        if version is None:
            return {"epochs": [], "buckets": {}, "schemas": {}}
        m = json.load(open(os.path.join(self._vdir(version), "meta.json")))
        m.setdefault("schemas", {})
        return m

    def _publish(self, version: int, manifest: dict) -> None:
        # The manifest must be durable BEFORE the CURRENT pointer swap —
        # otherwise a crash after the swap can publish a version with a
        # torn meta.json (ADVICE r7): explicit close + fsync, no reliance
        # on CPython refcount close ordering.
        with open(os.path.join(self._vdir(version), "meta.json"), "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path)

    def _gc(self, manifest: dict, new_version: int) -> None:
        """Remove version dirs no bucket references anymore."""
        live = set(manifest["buckets"].values()) | {new_version}
        for entry in os.listdir(self.state_dir):
            if entry.startswith("v") and entry[1:].isdigit():
                if int(entry[1:]) not in live:
                    shutil.rmtree(
                        os.path.join(self.state_dir, entry), ignore_errors=True
                    )

    def _bucket_paths(
        self, manifest: dict, side: str, buckets: set[int] | None = None
    ) -> list[str]:
        out = []
        for b, ver in manifest["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            p = os.path.join(self._vdir(ver), side, f"__bktp={b}")
            if os.path.exists(p):
                out.append(p)
        return out

    def _read_side(
        self, manifest: dict, side: str, buckets: set[int] | None = None
    ) -> DataFrame | None:
        """Compose a side as the union of its buckets' CURRENT locations
        (each possibly in a different version dir — the manifest is what
        makes untouched buckets free). When no bucket has data, returns
        an EMPTY frame in the side's recorded schema (a fully-deleted
        view is a legitimate state, not an error) — or None before the
        side has ever been written."""
        paths = self._bucket_paths(manifest, side, buckets)
        if not paths:
            schema_json = manifest["schemas"].get(side)
            if schema_json is None:
                return None
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(json.loads(schema_json))
            return self.spark.createDataFrame([], schema).withColumn(
                "__bkt", F.lit(None).cast("int")
            )
        # __bkt is stored as a DATA column (the partition dir __bktp= is
        # a duplicate), so all buckets read as ONE multi-path scan — a
        # per-bucket union would grow the plan linearly with bucket
        # count (measured: the 4-epoch driver query spent most of its
        # 19 s in per-epoch 16-way union plans before this).
        return self.spark.read.parquet(*paths)

    def _bkt(self, col: str):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.n_buckets)).cast("int")

    def _side_specs(self) -> list[tuple[str, list[str]]]:
        """Every maintained side with its within-bucket sort keys —
        compaction rewrites exactly these."""
        return [
            ("left", [self.left_id]),
            ("right", [self.join_key]),
            ("view", [self.left_id]),
        ]

    @staticmethod
    def _merge(old: DataFrame | None, delta: DataFrame, key_cols: list[str]) -> DataFrame:
        """Last-writer-wins merge of a CDC delta into the side state:
        max __seq per key wins (ties break toward the delete — the
        conservative CDC convention); surviving deletes evict the row."""
        rows = delta if old is None else old.unionByName(delta)
        w = W.partitionBy(*key_cols).orderBy(
            F.col("__seq").desc(), F.col("__op").asc()  # 'd' < 'u'
        )
        return (
            rows.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .filter(F.col("__op") == "u")
            .drop("__rn")
        )

    # -- the per-batch update -------------------------------------------

    def apply_batch(
        self,
        delta_left: DataFrame | None,
        delta_right: DataFrame | None,
        epoch_id: int,
    ) -> None:
        """Advance both side states and the join view by one micro-batch
        of deltas (either side may be None = no changes)."""
        cur = self._current_version()
        manifest = self._manifest(cur)
        if epoch_id in manifest["epochs"]:
            return  # replay after crash: committed state reflects this epoch
        new_v = (cur if cur is not None else 0) + 1
        vdir = self._vdir(new_v)
        shutil.rmtree(vdir, ignore_errors=True)  # stale uncommitted attempt
        os.makedirs(vdir)

        jk = self.join_key
        dl = (
            delta_left.withColumn("__bkt", self._bkt(jk))
            if delta_left is not None
            else None
        )
        dr = (
            delta_right.withColumn("__bkt", self._bkt(jk))
            if delta_right is not None
            else None
        )
        bkts = None
        for d in (dl, dr):
            if d is not None:
                bkts = d.select("__bkt") if bkts is None else bkts.union(d.select("__bkt"))
        affected = (
            {r["__bkt"] for r in bkts.distinct().collect()} if bkts is not None else set()
        )
        if not affected:
            self._publish_passthrough(cur, manifest, new_v, epoch_id)
            return

        # only the affected buckets' old state is ever read
        old_left = self._read_side(manifest, "left", affected)
        old_right = self._read_side(manifest, "right", affected)
        left_new = old_left if dl is None else self._merge(old_left, dl, [self.left_id])
        right_new = old_right if dr is None else self._merge(old_right, dr, [jk])
        if left_new is None or right_new is None:
            view_new = None
        else:
            lpay = [c for c in left_new.columns if c not in ("__op", "__seq", "__bkt")]
            rpay = [
                c
                for c in right_new.columns
                if c not in ("__op", "__seq", "__bkt", jk)
            ]
            view_new = left_new.select(*lpay, "__bkt").join(
                right_new.select(jk, *rpay), jk
            )

        schemas = dict(manifest["schemas"])

        def _write(df: DataFrame | None, side: str, key_cols: list[str]) -> None:
            if df is None:
                return
            schemas[side] = json.dumps(df.drop("__bkt").schema.jsonValue())
            (
                df.withColumn("__bktp", F.col("__bkt"))
                .repartition(len(affected), "__bkt")
                .sortWithinPartitions(*key_cols)
                .write.mode("overwrite")
                .partitionBy("__bktp")
                .parquet(os.path.join(vdir, side))
            )

        _write(left_new, "left", [self.left_id])
        _write(right_new, "right", [jk])
        _write(view_new, "view", [self.left_id])
        for side, (df, key_cols) in self._derived_sides(view_new).items():
            _write(df, side, key_cols)

        buckets = dict(manifest["buckets"])
        for b in affected:
            buckets[str(b)] = new_v
        new_manifest = {
            "epochs": manifest["epochs"] + [epoch_id],
            "buckets": buckets,
            "schemas": schemas,
        }
        self._publish(new_v, new_manifest)
        self._gc(new_manifest, new_v)

    def _derived_sides(self, view_new: DataFrame | None) -> dict:
        """Hook for subclasses that maintain relations DERIVED from the
        join view (e.g. per-bucket aggregate partials). Returns
        {side_name: (df_with___bkt, sort_key_cols)} to be written into
        the same version commit as the view itself — one atomic
        pointer swap covers view + derivations."""
        return {}

    def _publish_passthrough(
        self, cur: int | None, manifest: dict, new_v: int, epoch_id: int
    ) -> None:
        """Empty batch: record the epoch, keep every bucket pointer."""
        new_manifest = {
            "epochs": manifest["epochs"] + [epoch_id],
            "buckets": dict(manifest["buckets"]),
            "schemas": dict(manifest["schemas"]),
        }
        self._publish(new_v, new_manifest)
        self._gc(new_manifest, new_v)

    # -- readers ----------------------------------------------------------

    def view(self) -> DataFrame:
        cur = self._current_version()
        assert cur is not None, "no committed state yet"
        df = self._read_side(self._manifest(cur), "view")
        assert df is not None, "view was never written (no joined epochs yet)"
        return df.drop("__bkt")

    def compact(self) -> None:
        """Rewrite every bucket's current data into ONE fresh version
        and drop the rest — the maintenance pass that bounds manifest
        fan-out. After many small epochs the manifest references many
        version dirs (one open file per bucket per side at read time);
        compaction restores the single-dir layout without changing any
        visible row. Runs as its own atomic commit (same CURRENT
        protocol), so a crash mid-compaction leaves the old manifest
        intact. The analog of the parquet small-file compaction pass in
        operators/scale.py, applied to the view's own state."""
        cur = self._current_version()
        if cur is None:
            return
        manifest = self._manifest(cur)
        new_v = cur + 1
        vdir = self._vdir(new_v)
        shutil.rmtree(vdir, ignore_errors=True)
        os.makedirs(vdir)
        schemas = dict(manifest["schemas"])
        live_buckets: set[str] = set()
        for side, key_cols in self._side_specs():
            df = self._read_side(manifest, side)
            if df is None or not df.columns:
                continue
            schemas[side] = json.dumps(df.drop("__bkt").schema.jsonValue())
            (
                df.withColumn("__bktp", F.col("__bkt"))
                .repartition(self.n_buckets, "__bkt")
                .sortWithinPartitions(*key_cols)
                .write.mode("overwrite")
                .partitionBy("__bktp")
                .parquet(os.path.join(vdir, side))
            )
            for d in os.listdir(os.path.join(vdir, side)):
                if d.startswith("__bktp="):
                    live_buckets.add(d.split("=", 1)[1])
        new_manifest = {
            "epochs": manifest["epochs"],
            "buckets": {b: new_v for b in sorted(live_buckets, key=int)},
            "schemas": schemas,
        }
        self._publish(new_v, new_manifest)
        self._gc(new_manifest, new_v)

    def left_state(self) -> DataFrame:
        df = self._read_side(self._manifest(self._current_version()), "left")
        assert df is not None
        return df.drop("__bkt", "__op", "__seq")

    def right_state(self) -> DataFrame:
        df = self._read_side(self._manifest(self._current_version()), "right")
        assert df is not None
        return df.drop("__bkt", "__op", "__seq")


class MaterializedJoinAggregate(MaterializedJoin):
    """Maintained AGGREGATE over the maintained JOIN — the composition a
    CDC consumer actually materializes (the reference's mirror tables
    exist to feed exactly this shape: upsert sink → BI rollup;
    reference connect-iceberg-sink.json:29-30). ``GROUP BY group_cols``
    with sum/count/min/max measures over the join view, kept current
    under two-sided deltas.

    Maintenance algebra: the view is already recomputed ONLY for the
    join-key buckets a batch touches, so the aggregate keeps ONE
    partial-aggregate relation per bucket (rows = |groups present in
    that bucket|, written in the same atomic version commit as the
    view). A batch rewrites partials for affected buckets only — cost
    bounded by delta keys, never view size — and the full rollup is
    the re-combination of per-bucket partials at read time
    (n_buckets x n_groups rows, a broadcast-scale relation). Because
    each affected bucket's partial is recomputed from that bucket's
    full new slice (not incremented from deltas), NON-self-maintainable
    measures (min/max) are exact too — the classic IVM min/max-
    under-delete problem never arises.

    ``measures``: {out_col: (sql_expr_over_view_cols, fn)} with fn in
    {'sum', 'count', 'min', 'max'}. Partials use fn; re-combination
    uses sum for sum/count and fn for min/max."""

    _COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        left_id: str,
        join_key: str,
        group_cols: list[str],
        measures: dict[str, tuple[str, str]],
        n_buckets: int = 16,
    ) -> None:
        super().__init__(spark, state_dir, left_id, join_key, n_buckets)
        assert measures, "at least one measure"
        for name, (_, fn) in measures.items():
            assert fn in self._COMBINE, f"unsupported measure fn {fn!r} for {name!r}"
        self.group_cols = list(group_cols)
        self.measures = dict(measures)

    def _side_specs(self) -> list[tuple[str, list[str]]]:
        return super()._side_specs() + [("agg", self.group_cols)]

    def _derived_sides(self, view_new: DataFrame | None) -> dict:
        if view_new is None:
            return {}
        partial = {
            "sum": F.sum,
            "count": F.count,
            "min": F.min,
            "max": F.max,
        }
        agg = view_new.groupBy("__bkt", *self.group_cols).agg(
            *[
                partial[fn](F.expr(expr)).alias(name)
                for name, (expr, fn) in self.measures.items()
            ]
        )
        return {"agg": (agg, self.group_cols)}

    def aggregate(self) -> DataFrame:
        """The current rollup: re-combine the per-bucket partials. The
        input relation is at most n_buckets x |groups| rows — at 100 TB
        this read costs the same as at 100 MB."""
        cur = self._current_version()
        assert cur is not None, "no committed state yet"
        df = self._read_side(self._manifest(cur), "agg")
        assert df is not None, "aggregate was never written (no joined epochs)"
        return df.groupBy(*self.group_cols).agg(
            *[
                self._COMBINE[fn](F.col(name)).alias(name)
                for name, (_, fn) in self.measures.items()
            ]
        )


def materialized_join_stream(
    tagged_stream: DataFrame,
    mj: MaterializedJoin,
    checkpoint_dir: str,
    left_cols: list[str],
    right_cols: list[str],
):
    """Wire a MaterializedJoin into Structured Streaming: ONE stream of
    side-tagged delta rows (column ``__side`` in {'l', 'r'}; the union
    schema carries both sides' columns, the other side's as nulls)
    drives both sides of the view through foreachBatch. ``left_cols``/
    ``right_cols`` name each side's real columns (join key included);
    ``__op``/``__seq`` ride along.

    One tagged stream, not two queries: two independent streaming
    queries cannot share the CURRENT pointer without cross-query
    ordering (each would race the other's versions); a single
    micro-batch delivering both sides' deltas gives the view a total
    epoch order for free — the same reason CDC buses multiplex tables
    onto one changelog. Exactly-once composes: the epoch guard inside
    apply_batch makes replayed foreachBatch invocations no-ops."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            dl = batch_df.filter(F.col("__side") == "l").select(
                *left_cols, "__op", "__seq"
            )
            dr = batch_df.filter(F.col("__side") == "r").select(
                *right_cols, "__op", "__seq"
            )
            mj.apply_batch(
                dl if dl.limit(1).count() else None,
                dr if dr.limit(1).count() else None,
                epoch_id,
            )
        finally:
            batch_df.unpersist()

    return (
        tagged_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
