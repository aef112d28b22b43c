"""Externalized accumulated-doc state — the Elasticsearch analog.

The reference keeps **no** long-lived in-process state: every batch
re-fetches matching docs from ES by id (`terms _id`, scoped to the
batch's date-suffixed indices — /root/reference/lib/logship.js:259-312)
and bulk-upserts the merged docs back (:337-393, `create` fails
harmlessly on replay, `doc_as_upsert` + `detect_noop` make updates
idempotent). That design is the key scaling insight we keep: executor
state stays bounded by the batch regardless of total history.

Spark design:
- state lives in a parquet table partitioned by ``(sink, route_date)``
  (Iceberg-shaped layout; at production scale the same code targets an
  Iceberg table and the upsert becomes ``MERGE INTO``)
- lookup = inner equi-join of the state table (partition-pruned to the
  batch's distinct dates, mirroring uniqYMDs) with the batch's distinct
  qids — the J1 lookup join
- continuation = **cogrouped fold**: state docs ⊔ batch lines by qid,
  seeding :func:`~..operators.assemble.fold_lines` with the committed
  doc so events append in cross-batch order
- upsert = dynamic partition overwrite scoped to the touched
  ``(sink, route_date)`` partitions: incoming docs replace same-qid
  rows, untouched rows in those partitions are carried over, all other
  partitions are never rewritten
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .assemble import DOC_FIELDS


class StateStore:
    """Parquet/Iceberg-layout doc store keyed by qid."""

    def __init__(self, path: str):
        self.path = path

    def _fs(self, spark: SparkSession):
        sc = spark.sparkContext
        jvm = sc._jvm  # type: ignore[attr-defined]
        conf = sc._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
        mk = jvm.org.apache.hadoop.fs.Path
        hpath = mk(self.path)
        return mk, hpath, hpath.getFileSystem(conf)

    def _recover_swap(self, spark: SparkSession) -> bool:
        """Heal a crashed :meth:`compact` swap. The swap is
        rename(base→old) then rename(tmp→base); a crash between the
        two leaves the live path absent while a COMPLETE copy exists
        under ``__compact_tmp`` (written and closed before the first
        rename) and the pre-compaction copy under ``__compact_old``.
        Without recovery, read()/exists() report 'no state' — a valid
        empty-store answer, so the next run silently proceeds from
        nothing and a later cleanup deletes the only copy.

        Rule (checked only when base is ABSENT, so the happy path
        pays nothing): promote tmp if present (newest complete copy),
        else promote old; delete the other copy only AFTER base is
        restored. Returns True iff a recovery rename happened."""
        mk, hpath, fs = self._fs(spark)
        if fs.exists(hpath):
            return False
        base = self.path.rstrip("/")
        p_tmp = mk(base + "__compact_tmp")
        p_old = mk(base + "__compact_old")
        if fs.exists(p_tmp):
            if not fs.rename(p_tmp, hpath):
                raise IOError(
                    f"state recovery: {base} absent and promoting "
                    f"__compact_tmp failed — refusing to treat the "
                    f"store as empty")
            fs.delete(p_old, True)
            return True
        if fs.exists(p_old):
            if not fs.rename(p_old, hpath):
                raise IOError(
                    f"state recovery: {base} absent and promoting "
                    f"__compact_old failed — refusing to treat the "
                    f"store as empty")
            return True
        return False

    def exists(self, spark: SparkSession) -> bool:
        _, hpath, fs = self._fs(spark)
        if fs.exists(hpath):
            return True
        # base absent: before answering "empty store", heal any
        # crashed compact swap (survivor dirs ⇒ state DOES exist)
        return self._recover_swap(spark)

    def preflight(self, spark: SparkSession) -> None:
        """Sink availability gate — the reference pings ES before
        starting the log reader and shuts down on failure
        (/root/reference/lib/logship.js:35-45), so a misconfigured sink
        fails BEFORE any parse work is spent. Here: prove the state
        root is creatable and writable through its Hadoop FileSystem
        (covers local, hdfs and s3a paths alike) by creating and
        deleting a probe file. Raises PermissionError on any failure;
        callers run this before the first input scan."""
        sc = spark.sparkContext
        jvm = sc._jvm  # type: ignore[attr-defined]
        conf = sc._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
        try:
            hpath = jvm.org.apache.hadoop.fs.Path(self.path)
            fs = hpath.getFileSystem(conf)
            fs.mkdirs(hpath)
            probe = jvm.org.apache.hadoop.fs.Path(
                self.path, "_preflight.probe")
            out = fs.create(probe, True)
            out.close()
            fs.delete(probe, False)
        except Exception as exc:  # noqa: BLE001 — any FS failure gates
            raise PermissionError(
                f"sink/state path {self.path!r} failed preflight "
                f"write probe: {exc}") from exc

    def compact(self, spark: SparkSession) -> bool:
        """Small-file maintenance — the Iceberg ``rewrite_data_files``
        / OPTIMIZE analog. Every micro-batch upsert writes its own
        parquet files into the partitions it touches, so a hot
        ``(sink, route_date)`` partition accumulates one file set per
        batch; at 10⁴ batches/day the read-side file count (and footer
        metadata) dominates lookup latency. Compaction rewrites each
        partition to one file per partition key: one shuffle keyed on
        the partition columns, content-identical output. Returns True
        iff a rewrite happened. Run out-of-band (the upsert path never
        needs it for correctness — pinned by the replay tests).

        Implementation: write the compacted layout to a temporary
        sibling directory, then swap it in with two FileSystem renames
        (old→trash, tmp→live) and delete the old files last. Unlike a
        ``localCheckpoint`` of the whole table into executor block
        storage, this streams executor-memory-bounded partitions and
        never holds total state size in block-manager memory/disk —
        the incremental-rewrite property Iceberg's OPTIMIZE has. The
        swap window is two metadata renames; a reader racing them
        retries (the reference's per-batch ES reads have the same
        read-during-bulk-write window)."""
        state = self.read(spark)
        if state is None:
            return False
        base = self.path.rstrip("/")
        tmp, trash = base + "__compact_tmp", base + "__compact_old"
        (state.repartition("sink", "route_date")
         .write.mode("overwrite")
         .partitionBy("sink", "route_date")
         .parquet(tmp))
        sc = spark.sparkContext
        jvm = sc._jvm  # type: ignore[attr-defined]
        conf = sc._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
        hpath = jvm.org.apache.hadoop.fs.Path(base)
        fs = hpath.getFileSystem(conf)
        p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
        p_trash = jvm.org.apache.hadoop.fs.Path(trash)
        fs.delete(p_trash, True)  # stale trash from a crashed run
        if not fs.rename(hpath, p_trash):
            fs.delete(p_tmp, True)
            raise IOError(f"compact: could not move {base} aside")
        if not fs.rename(p_tmp, hpath):
            fs.rename(p_trash, hpath)  # roll back — old data intact
            raise IOError(f"compact: could not swap {tmp} into {base}")
        fs.delete(p_trash, True)
        return True

    def read(self, spark: SparkSession) -> Optional[DataFrame]:
        if not self.exists(spark):
            return None
        try:
            return spark.read.parquet(self.path)
        except Exception as exc:  # existing-but-empty dir (e.g. only the
            # preflight probe ran): no committed state yet
            if "UNABLE_TO_INFER_SCHEMA" in str(exc):
                return None
            raise

    def lookup(self, spark: SparkSession, keys: DataFrame,
               dates: Optional[list[str]] = None) -> Optional[DataFrame]:
        """Committed docs matching the batch's qids.

        ``dates`` prunes state partitions exactly like the reference's
        uniqYMD index list confines the ES search (lib/logship.js:263-279).
        """
        state = self.read(spark)
        if state is None:
            return None
        if dates:
            state = state.filter(F.col("route_date").isin(dates))
        return state.join(F.broadcast(keys.select("qid").distinct()),
                          "qid", "inner")

    @staticmethod
    def _doc_hash(df: DataFrame) -> Column:
        """Canonical content hash of a doc row (sorted-column JSON →
        xxhash64) — the detect_noop comparator."""
        cols = [F.col(f"`{c}`") for c in sorted(df.columns)]
        return F.xxhash64(F.to_json(F.struct(*cols)))

    def upsert(self, spark: SparkSession, incoming: DataFrame,
               detect_noop: bool = True) -> bool:
        """MERGE-equivalent: replace-by-qid within touched partitions.

        Uses dynamic partition overwrite so only (sink, route_date)
        partitions present in ``incoming`` are rewritten — the scan and
        rewrite cost scales with the batch's day-spread, not with total
        state size. The required
        ``spark.sql.sources.partitionOverwriteMode=dynamic`` is set for
        the duration of the write and restored afterwards: under the
        default ``static`` mode the overwrite would truncate the WHOLE
        table while the lazy carry rows still read from it — total loss
        of untouched partitions.

        ``detect_noop=True`` (the reference's ``detect_noop: true``
        bulk-update option, lib/logship.js:370) suppresses writes at
        **per-partition granularity**: the reference's detect_noop is
        per *document*, and the closest parquet-overwrite analog is to
        rewrite only the ``(sink, route_date)`` partitions that contain
        at least one changed-or-new doc — partitions a batch merely
        *touches* with byte-identical docs keep their files untouched
        (mtimes included; pinned by
        tests/test_round3.py::test_upsert_rewrites_only_changed_partitions).
        This is the behavior a real Iceberg ``MERGE INTO`` gives
        (rewrite only matching files); at scale the difference is the
        dominant write cost — a micro-batch touching a hot day-
        partition with one changed doc must not rewrite the whole day
        spread including carry rows. A fully-unchanged batch returns
        False and writes nothing (idempotent replay). The extra cost is
        one hash-only anti-join over the touched partitions — id+hash
        longs plus the partition keys, never doc bodies.

        Partition migration (qid committed under one (sink, route_date)
        arriving under another — e.g. an orphan→parent sink flip when
        the parent map gains an entry between batches): the committed-
        side partitions of changed qids are added to the rewrite set,
        so the stale committed row is dropped from its OLD partition in
        the same write (without this the old partition kept a duplicate
        row per migrated qid). A partition whose every row migrated
        away would write zero rows — dynamic overwrite cannot express
        an empty partition, so those are deleted explicitly after the
        write. NOTE the pipeline additionally *pins* committed docs to
        their committed (sink, route_date) exactly like the reference
        pins matched docs to their found ES index
        (/root/reference/lib/logship.js:298), so migrations never reach
        this path in the normal flow; this handling keeps direct upsert
        callers correct too. Migrations across route_dates OUTSIDE the
        batch's date spread are invisible by design — the same scoping
        the reference's uniqYMD index list imposes on its ES search.
        With ``detect_noop=False`` (raw replace mode, non-default) a
        partition fully emptied by migration is NOT cleaned — that
        mode skips the committed-side key scan entirely; use the
        default, or keep the pipeline's routing pin, where migrations
        are possible.
        """
        state = self.read(spark)
        emptied_parts: list[str] = []
        migrated_only: set[str] = set()
        if state is not None:
            touched = [r["route_date"] for r in
                       incoming.select("route_date").distinct().collect()]
            scoped = state.filter(F.col("route_date").isin(touched))
            if detect_noop:
                pkey = F.concat_ws("\x00", F.col("sink"),
                                   F.col("route_date"))
                inc_keyed = incoming.select(
                    pkey.alias("_p"), "qid",
                    self._doc_hash(incoming).alias("_h"))
                st_keyed = scoped.select(
                    pkey.alias("_p"), "qid",
                    self._doc_hash(scoped).alias("_h"))
                # changed-or-new docs: no committed row with same hash
                changed = inc_keyed.join(
                    st_keyed.select("qid", "_h"), ["qid", "_h"],
                    "left_anti").localCheckpoint(eager=True)
                inc_parts = {r["_p"] for r in
                             changed.select("_p").distinct().collect()}
                # ...plus the OLD partitions of those qids (migration)
                old_side = st_keyed.join(
                    changed.select("qid").distinct(), "qid", "inner")
                old_parts = {r["_p"] for r in
                             old_side.select("_p").distinct().collect()}
                changed_parts = sorted(inc_parts | old_parts)
                if not changed_parts:
                    return False
                # bounded metadata: batch day-spread × sinks entries
                incoming = incoming.filter(pkey.isin(changed_parts))
                scoped = scoped.filter(pkey.isin(changed_parts))
                migrated_only = old_parts - inc_parts
            carry = scoped.join(incoming.select("qid").distinct(), "qid",
                                "left_anti")
            incoming = incoming.unionByName(carry)
            if detect_noop and migrated_only:
                # a migration left old partitions with possibly zero
                # surviving rows — dynamic overwrite cannot express an
                # empty partition, so find and delete those explicitly.
                # Runs ONLY when a migration was detected (the common
                # no-migration batch pays no extra action).
                out_parts = {r["_p"] for r in
                             incoming.select(pkey.alias("_p"))
                             .distinct().collect()}
                emptied_parts = sorted(migrated_only - out_parts)
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf_key, "static")
        spark.conf.set(conf_key, "dynamic")
        try:
            (incoming.write.mode("overwrite")
             .partitionBy("sink", "route_date")
             .parquet(self.path))
        finally:
            spark.conf.set(conf_key, prev)
        if emptied_parts:
            sc = spark.sparkContext
            jvm = sc._jvm  # type: ignore[attr-defined]
            conf = sc._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
            for p in emptied_parts:
                sink, rd = p.split("\x00", 1)
                part_dir = jvm.org.apache.hadoop.fs.Path(
                    f"{self.path.rstrip('/')}/sink={sink}/route_date={rd}")
                fs = part_dir.getFileSystem(conf)
                fs.delete(part_dir, True)
        return True


def merge_with_state(
    parsed: DataFrame,
    state_docs: Optional[DataFrame],
    order_cols: Optional[list[str]] = None,
    *,
    salt_hot_keys: bool = False,
    n_salts: int = 8,
) -> DataFrame:
    """Continuation fold: committed docs ⊔ new lines by qid.

    Equivalent to the reference's populatePfdocsFromEs → updatePfDocs
    sequence: a qid with a committed doc continues from it; a fresh qid
    starts from the template. Implemented as a **seed-row union**: each
    committed doc becomes one row carrying its JSON form with
    batch_seq/line_no = −1, unioned into the parsed-line stream, so the
    continuation costs exactly the same single exchange as the plain
    fold (no per-key cogroup round-trips).

    ``salt_hot_keys=True`` runs the skew-resistant two-phase fold
    instead — the seed row rides the same union and is restored inside
    the salted partial phase (bit-identical result; pinned by
    tests/test_round3.py::test_salted_state_continuation_equals_plain),
    so streaming/state batches keep hot-key protection too."""
    from .assemble import assemble, assemble_salted

    order_cols = order_cols or ["batch_seq", "line_no"]

    def _fold(df: DataFrame) -> DataFrame:
        if salt_hot_keys:
            return assemble_salted(df, n_salts=n_salts,
                                   order_cols=order_cols)
        return assemble(df, order_cols=order_cols)

    if state_docs is None:
        return _fold(parsed)

    ptypes = dict(parsed.dtypes)
    doc_cols = [F.col(f"`{f.name}`") for f in DOC_FIELDS]
    seeds = state_docs.select(
        F.col("qid"),
        F.to_json(F.struct(*doc_cols)).alias("_seed_json"),
        F.lit(-1).cast(ptypes.get("batch_seq", "bigint")).alias("batch_seq"),
        F.lit(-1).cast(ptypes.get("line_no", "bigint")).alias("line_no"),
    )
    unioned = parsed.unionByName(seeds, allowMissingColumns=True)
    return _fold(unioned)
