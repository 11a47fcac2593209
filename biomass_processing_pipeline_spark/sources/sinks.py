"""Result sinks (SURVEY.md S7-S9).

Reference semantics: batched ``INSERT ... ON CONFLICT DO UPDATE`` upserts
(``/root/reference/src/core/database_manager_v3.py:644-809``), normalized
detail-row bulk inserts (``:811-1004``), and a flat CSV export
(``src/config/processing_config_v3.py:43-70``).

Spark mapping: parquet sinks here; on a real deployment the upsert is an
Iceberg ``MERGE INTO`` — the parquet emulation below implements the same
keep-latest-by-key semantics with an anti-join + union rewrite, and is the
documented fallback when no Iceberg catalog is configured (the session
does not hard-require Iceberg, SURVEY.md §7.0 point 1).
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Hidden hash-bucket partition column of the upsert table layout. A key
# lives in exactly one bucket, so an upsert batch can only conflict with
# rows inside the buckets its own keys hash to — every other partition is
# provably untouched and its files are never read, rewritten, or moved.
UPSERT_BUCKET_COL = "_ub"


def _upsert_bucket(key_cols: list[str], n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")


class _swap_lock:
    """Exclusive advisory lock (O_EXCL lock file) serializing every
    bucket-swap mutation of one upsert table — the writer's swap loop and
    any reader's roll-forward repair. Without it two repairers (or a
    repairer racing a retrying writer) can interleave ``rmtree`` +
    ``rename`` on the same bucket and delete a freshly-swapped directory.
    Local-FS stand-in for the Iceberg commit protocol's optimistic lock,
    like the rename swap itself. A crashed holder leaves the lock file:
    time out LOUDLY with removal guidance rather than guessing."""

    def __init__(self, path: str, timeout_s: float = 60.0):
        self.lock = os.path.join(path, "_SWAP.lock")
        self.timeout_s = timeout_s

    def __enter__(self):
        import time

        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                os.close(os.open(self.lock, os.O_CREAT | os.O_EXCL))
                return self
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise RuntimeError(
                        f"{self.lock} held for >{self.timeout_s}s — if the "
                        "holding process is dead, remove the lock file and "
                        "retry"
                    ) from None
                time.sleep(0.05)

    def __exit__(self, *exc):
        try:
            os.remove(self.lock)
        except FileNotFoundError:
            pass
        return False


def _repair_pending_upsert(path: str) -> bool:
    """Roll an interrupted bucket swap FORWARD (idempotent): the
    ``_PENDING.json`` marker is written only after the staged write is
    complete, so every touched bucket either already swapped in (staged
    dir gone) or can be swapped now. Returns True if a repair ran.

    This closes the crash-mid-swap window of the multi-bucket rename loop:
    a reader (or the lineage resume) that finds the marker repairs the
    table to the batch's committed state before reading, instead of
    silently seeing half-old half-new buckets. Concurrent callers
    serialize on ``_swap_lock``; whoever wins repairs, the rest see the
    marker gone and return.
    """
    import json
    import shutil

    pend = os.path.join(path, "_PENDING.json")
    if not os.path.exists(pend):
        return False
    with _swap_lock(path):
        if not os.path.exists(pend):  # lost the race: already repaired
            return False
        with open(pend) as fh:
            info = json.load(fh)
        tmp = info["staged"]
        for b in info["touched"]:
            src = os.path.join(tmp, f"{UPSERT_BUCKET_COL}={b}")
            dst = os.path.join(path, f"{UPSERT_BUCKET_COL}={b}")
            if os.path.exists(src):
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                os.rename(src, dst)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.remove(pend)
    return True


def read_upsert_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read an upsert table without its internal bucket column, repairing
    an interrupted bucket swap first (see ``_repair_pending_upsert``)."""
    _repair_pending_upsert(path)
    return spark.read.parquet(path).drop(UPSERT_BUCKET_COL)


def upsert_parquet(
    spark: SparkSession, new: DataFrame, path: str, key_cols: list[str],
    n_buckets: int = 64, seq_col: str | None = None,
) -> int:
    """Keep-latest upsert: rows in ``new`` replace same-key rows in the
    existing table; everything else is preserved. Returns row count after.

    Emulates ``ON CONFLICT (keys) DO UPDATE`` / Iceberg MERGE INTO
    (reference ``database_manager_v3.py:727-732``) with Iceberg-shaped
    write amplification: the table is laid out hash-bucketed by key
    (``_ub = pmod(xxhash64(keys), n_buckets)`` partition directories), and
    an upsert batch rewrites ONLY the buckets its keys hash to —
    partition pruning serves the anti-join scan, and all other buckets'
    files stay physically untouched (same inode/mtime; tested). The old
    full-table staged rewrite was O(table) writes per batch; this is
    O(touched buckets), the MERGE cost shape.

    Commit protocol: touched buckets are staged to a temp dir, then each
    bucket directory is swapped in with a filesystem move — per-bucket
    atomic on a local FS (an object store deployment would use the Iceberg
    commit protocol instead; re-applying the same batch converges, so a
    crash mid-swap is repaired by a retry).

    Size ``n_buckets`` so one bucket ≈ a comfortable task (at 100 TB:
    thousands of buckets); it is fixed at table creation and read back
    from the existing layout on later batches.

    Within-batch conflicts: the reference applies batch rows IN ORDER
    (``execute_values`` row-by-row, last conflicting row wins —
    ``database_manager_v3.py:789-792``). A distributed DataFrame has no
    row order, so the precedence must be explicit: pass ``seq_col`` (a
    batch sequence / version column, dropped from the stored table) and
    the max-seq row per key wins (seq ties broken by a deterministic
    row-content hash so re-runs converge). Without ``seq_col`` the batch
    is REQUIRED key-unique and a duplicated key raises — silently keeping
    both rows would violate the keep-latest contract.
    """
    import shutil

    from pyspark.sql import Observation, Window

    import json

    if seq_col is not None:
        others = [c for c in new.columns if c != seq_col]
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), F.xxhash64(*others).desc()
        )
        new = (
            new.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn", seq_col)
        )

    # ONE materialization of the batch serves every consumer below (the
    # dup-key guard, the touched-bucket collect, the anti-join key set,
    # the staged write) — each is a separate Spark job that would
    # otherwise recompute the batch's entire upstream lineage.
    # MEMORY_AND_DISK (not localCheckpoint) so a lost executor recomputes
    # the block instead of failing the upsert.
    from pyspark import StorageLevel

    new = new.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # NULL keys are unreachable by keep-latest (SQL equality never
        # matches NULL, so the anti-join can never replace such a row —
        # it would silently accumulate forever, or silently collapse in
        # the seq_col window). The reference PK columns are NOT NULL
        # (Postgres primary keys); hold callers to the same contract.
        null_key = new.where(
            reduce(lambda a, b: a | b,
                   [F.col(c).isNull() for c in key_cols])
        ).limit(1).count()
        if null_key:
            raise ValueError(
                f"upsert batch contains NULL in key column(s) {key_cols}: "
                "a NULL key can never be matched by a later upsert "
                "(SQL equality skips NULLs) — filter or fill upstream"
            )
        if seq_col is None:
            dup = (
                new.groupBy(*key_cols).count()
                .where(F.col("count") > 1).limit(1).count()
            )
            if dup:
                raise ValueError(
                    "upsert batch contains duplicate keys and no seq_col: "
                    "keep-latest is undefined without an explicit "
                    f"precedence (keys={key_cols}; pass seq_col=... to "
                    "pick last-wins)"
                )

        obs = Observation("upsert_rows")
        meta_path = os.path.join(path, "_upsert_meta.json")
        if os.path.exists(path):
            _repair_pending_upsert(path)
        exists = os.path.exists(path)
        if not exists:
            # table CREATE is staged + one atomic dir rename: a crash
            # mid-write must not leave a torn, marker-less table at
            # ``path`` that readers would serve as valid data (and whose
            # missing _upsert_meta.json would kill the next batch) — with
            # staging, readers see either no table or the complete one.
            # The meta file is written INSIDE the staged dir so it commits
            # with the data.
            tmp = path.rstrip("/") + "._create_staged"
            first = new.withColumn(UPSERT_BUCKET_COL,
                                   _upsert_bucket(key_cols, n_buckets))
            (
                first.observe(obs, F.count(F.lit(1)).alias("n"))
                .write.mode("overwrite")
                .partitionBy(UPSERT_BUCKET_COL).parquet(tmp)
            )
            with open(os.path.join(tmp, "_upsert_meta.json"), "w") as fh:
                json.dump({"n_buckets": n_buckets, "key_cols": key_cols}, fh)
            os.rename(tmp, path)
            return int(obs.get["n"])

        old = spark.read.parquet(path)
        if UPSERT_BUCKET_COL not in old.columns:
            raise ValueError(
                f"{path} is not an upsert table (missing {UPSERT_BUCKET_COL} "
                "partition layout)"
            )
        # the bucket count is a property of the EXISTING layout (hashing
        # with a different modulus would strand a key's old row in another
        # bucket) — read it back from the table's metadata, ignoring the
        # parameter
        with open(meta_path) as fh:
            n_buckets = int(json.load(fh)["n_buckets"])
        new_b = new.withColumn(UPSERT_BUCKET_COL,
                               _upsert_bucket(key_cols, n_buckets))
        # the touched-bucket set is at most n_buckets values — a tiny
        # collect
        touched = sorted(
            r[0]
            for r in new_b.select(UPSERT_BUCKET_COL).distinct().collect()
        )
        # partition-pruned scan: only touched bucket directories are read
        keep = (
            old.where(F.col(UPSERT_BUCKET_COL).isin(touched))
            .join(new.select(*key_cols).distinct(), key_cols, "left_anti")
        )
        merged = keep.unionByName(new_b)
        tmp = path.rstrip("/") + "._staged"
        (
            merged.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .partitionBy(UPSERT_BUCKET_COL).parquet(tmp)
        )
        touched_rows = int(obs.get["n"])
        # untouched row count is parquet footer metadata, not a data pass
        untouched_rows = old.where(
            ~F.col(UPSERT_BUCKET_COL).isin(touched)
        ).count()
        # intent marker BEFORE the swap loop (atomic tmp-file replace): a
        # crash between any two renames leaves the marker behind, and
        # readers / retries roll the swap forward instead of seeing a
        # half-applied batch. The marker write + swap run under the same
        # _swap_lock the repair path takes, so a concurrent reader-repair
        # cannot interleave its renames with ours.
        pend = os.path.join(path, "_PENDING.json")
        with _swap_lock(path):
            with open(pend + ".tmp", "w") as fh:
                json.dump({"touched": touched, "staged": tmp}, fh)
            os.replace(pend + ".tmp", pend)
            for b in touched:
                src = os.path.join(tmp, f"{UPSERT_BUCKET_COL}={b}")
                dst = os.path.join(path, f"{UPSERT_BUCKET_COL}={b}")
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                if os.path.exists(src):  # every touched bucket has new rows
                    os.rename(src, dst)
            shutil.rmtree(tmp)
            os.remove(pend)  # commit point: swap fully applied
        return touched_rows + untouched_rows
    finally:
        new.unpersist()


def append_detail(df: DataFrame, path: str) -> None:
    """S8 normalized detail sink: plain bulk append of exploded rows."""
    df.write.mode("append").parquet(path)


CSV_COLUMNS = [
    # S9: flat export projection, analogue of the 19-col v1 schema
    # (processing_config_v3.py:43-70)
    "image_id", "fips", "tile_code", "biomass_type", "source_code",
    "area_acres", "yield_tons", "harvestable_tons", "ndvi", "evi", "savi",
    "ndwi", "confidence_score",
]


def write_csv(df: DataFrame, path: str) -> None:
    """S9 CSV sink: stable column order + header, one directory of parts."""
    cols = [c for c in CSV_COLUMNS if c in df.columns]
    df.select(*cols).write.mode("overwrite").option("header", True).csv(path)


# --- DecimalType parity shim (SURVEY §1.3) ---------------------------------
# The reference's result table declares NUMERIC(p,s) columns
# (database_manager_v3.py:669-695); the engine computes in DoubleType
# (SURVEY §1.3 explicitly allows this) and this shim restores the exact
# declared precision AT THE SINK BOUNDARY. Matching is by column name /
# suffix, mirroring the reference's naming conventions.
_DECIMAL_RULES: list[tuple[tuple[str, ...], tuple[int, int]]] = [
    # exact names first, then suffix families
    (("ndvi", "evi", "savi", "ndwi", "ndvi_mean"), (6, 4)),
    (("confidence_score",), (4, 3)),
    (("centroid_lon", "centroid_lat", "lon", "lat"), (12, 8)),
]
_DECIMAL_SUFFIX_RULES: list[tuple[str, tuple[int, int]]] = [
    ("_tons", (12, 3)),
    ("_acres", (10, 3)),
    ("_percentage", (5, 2)),
    ("_pct", (5, 2)),
]


def reference_decimal_schema(columns: list[str]) -> dict[str, tuple[int, int]]:
    """column name -> (precision, scale) for every column the reference
    declares as NUMERIC; unmatched columns are left untouched."""
    out: dict[str, tuple[int, int]] = {}
    for c in columns:
        for names, ps in _DECIMAL_RULES:
            if c in names:
                out[c] = ps
                break
        else:
            for suffix, ps in _DECIMAL_SUFFIX_RULES:
                if c.endswith(suffix):
                    out[c] = ps
                    break
    return out


def cast_reference_decimals(df: DataFrame) -> DataFrame:
    """Cast double columns to the reference's NUMERIC(p,s) at the sink
    boundary (ANSI mode: an out-of-range value fails the write loudly,
    the same contract the reference's NUMERIC columns enforce)."""
    schema = reference_decimal_schema(df.columns)
    return df.select(*[
        F.col(c).cast(f"decimal({schema[c][0]},{schema[c][1]})").alias(c)
        if c in schema else F.col(c)
        for c in df.columns
    ])
