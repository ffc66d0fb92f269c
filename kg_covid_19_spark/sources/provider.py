"""Catalog-or-path table provider — the Iceberg seam (SURVEY.md §1.1,
§7.4 risk 6).

The production posture is Iceberg tables in a configured catalog; the
sandbox has no Iceberg jars, so path-Parquet is the hermetic fallback.
The seam is deliberately the Spark **V2 catalog API**, not anything
Iceberg-specific: with ``spark.sql.catalog.<name> =
org.apache.iceberg.spark.SparkCatalog`` configured, ``catalog="<name>"``
routes reads through ``spark.read.table`` and writes through
``DataFrameWriterV2`` — and those identical calls work against ANY V2
catalog. That is what lets the sandbox test EXERCISE the catalog branch
for real (against the built-in ``spark_catalog`` with parquet tables)
instead of asserting it: swapping in Iceberg is a config change, not a
code change.

Partition pruning is provider-independent — both the path-parquet
``partitionBy`` layout and an Iceberg partition spec expose partition
columns to Catalyst, so a ``lang = 'en'`` filter prunes files either
way (pinned by test_provider_partition_pruning).

Reference analog: kg-covid-19 reads/writes local files per transform
(run.py transform paths); this provider is the 100-TB-scale seam those
paths become on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: session conf key that names the catalog to route through; unset (or
#: empty) means path-Parquet under the provider root.
CATALOG_CONF = "spark.kg.catalog"


class TableProvider:
    """One read/write indirection over driver tables.

    ``catalog=None`` reads the session conf ``spark.kg.catalog``; an
    explicit name wins. With a catalog, table ``name`` resolves to
    ``<catalog>.<namespace>.<name>``; without one, to
    ``<root>/<name>.parquet``.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        catalog: str | None = None,
        namespace: str = "default",
    ) -> None:
        self.spark = spark
        self.root = root
        if catalog is None:
            try:
                catalog = spark.conf.get(CATALOG_CONF, "") or None
            except Exception:
                catalog = None
        self.catalog = catalog
        self.namespace = namespace

    # -- identity -------------------------------------------------------
    def qualified(self, name: str) -> str:
        """Catalog-qualified identifier (catalog mode only)."""
        return f"{self.catalog}.{self.namespace}.{name}"

    def location(self, name: str) -> str:
        """Path location (path mode only)."""
        return os.path.join(self.root, f"{name}.parquet")

    # -- read -----------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(self.qualified(name))
        return self.spark.read.parquet(self.location(name))

    def _drop_orphan_location(self, table: str) -> None:
        """Remove a stray managed-table directory a previously FAILED
        staging CTAS left behind (DROP TABLE can't see it — there is no
        table, only the location) so the retry doesn't die with
        LOCATION_ALREADY_EXISTS. Best-effort via the Hadoop FS API."""
        try:
            wh = self.spark.conf.get("spark.sql.warehouse.dir")
            # default namespace lays out {wh}/{table}; named namespaces
            # {wh}/{ns}.db/{table} — clean whichever exists
            candidates = [f"{wh}/{table}"]
            if self.namespace != "default":
                candidates = [f"{wh}/{self.namespace}.db/{table}"]
            jvm = self.spark._jvm
            conf = self.spark._jsc.hadoopConfiguration()
            for loc in candidates:
                path = jvm.org.apache.hadoop.fs.Path(loc)
                path.getFileSystem(conf).delete(path, True)
        except Exception:
            pass  # no orphan, a non-filesystem catalog, or Connect
            # (no _jvm) — the staging create will surface any real
            # leftover as LOCATION_ALREADY_EXISTS

    # -- write ----------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: tuple[str, ...] = (),
        fmt: str = "parquet",
    ) -> None:
        """Overwrite-create ``name`` from ``df``.

        Catalog mode uses DataFrameWriterV2 (``writeTo``), the API an
        Iceberg catalog implements; ``partition_by`` becomes the table's
        partition spec. Path mode writes partitioned parquet — the same
        pruning-visible layout."""
        if self.catalog:
            w = df.writeTo(self.qualified(name)).using(fmt)
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            try:
                w.createOrReplace()
            except Exception as exc:
                # Fall back ONLY for the specific missing-RTAS
                # capability (the built-in session catalog; some Hive
                # catalogs). Any other failure — analysis error,
                # executor loss, permissions — must propagate WITHOUT
                # touching the existing table. Iceberg supports RTAS
                # and never reaches this branch.
                msg = str(exc)
                if not ("REPLACE TABLE" in msg
                        or "UNSUPPORTED_FEATURE" in msg):
                    raise
                # Non-atomic catalogs get a staging swap, not
                # drop-then-create: the CTAS runs (and can fail) while
                # the previous table is still intact; only a fully
                # written staging table replaces it.
                staging = f"{name}__staging"
                old = f"{name}__old"
                # Crash recovery FIRST: a prior run that died between
                # rename-out and rename-in left no live <name> but the
                # previous data intact under <name>__old. Restore it
                # before clearing leftovers, so a failure in THIS run's
                # staging CTAS still leaves a readable table (the
                # advertised recoverability guarantee).
                if (not self.spark.catalog.tableExists(
                            self.qualified(name))
                        and self.spark.catalog.tableExists(
                            self.qualified(old))):
                    self.spark.sql(
                        f"ALTER TABLE {self.qualified(old)} "
                        f"RENAME TO {self.namespace}.{name}"
                    )
                    if any(
                        c.isPartition
                        for c in self.spark.catalog.listColumns(
                            self.qualified(name))
                    ):
                        self.spark.sql(
                            f"MSCK REPAIR TABLE {self.qualified(name)} "
                            f"SYNC PARTITIONS"
                        )
                for leftover in (staging, old):
                    self.spark.sql(
                        f"DROP TABLE IF EXISTS {self.qualified(leftover)}"
                    )
                    self._drop_orphan_location(leftover)
                ws = df.writeTo(self.qualified(staging)).using(fmt)
                if partition_by:
                    ws = ws.partitionedBy(
                        *[F.col(c) for c in partition_by]
                    )
                ws.create()
                # Swap: rename the live table ASIDE first — never DROP
                # it while it is the only copy. A crash between the two
                # renames leaves the previous data recoverable under
                # the predictable <name>__old, and the readers-see-no-
                # table window shrinks to the instant between
                # rename-out and rename-in.
                had_live = self.spark.catalog.tableExists(
                    self.qualified(name)
                )
                if had_live:
                    self.spark.sql(
                        f"ALTER TABLE {self.qualified(name)} "
                        f"RENAME TO {self.namespace}.{old}"
                    )
                    if partition_by:
                        # the rename moved the data dir but the old
                        # table's partition entries still point at the
                        # ORIGINAL location — which the staging rename
                        # is about to reoccupy. Re-sync them to the
                        # moved location NOW, or the later DROP of
                        # __old follows the stale partition paths and
                        # deletes the freshly swapped-in data.
                        self.spark.sql(
                            f"MSCK REPAIR TABLE {self.qualified(old)} "
                            f"SYNC PARTITIONS"
                        )
                self.spark.sql(
                    f"ALTER TABLE {self.qualified(staging)} "
                    f"RENAME TO {self.namespace}.{name}"
                )
                if had_live:
                    self.spark.sql(
                        f"DROP TABLE IF EXISTS {self.qualified(old)}"
                    )
                if partition_by:
                    # the rename moves the managed location but the
                    # catalog's partition entries still point at the
                    # staging paths — SYNC (add + drop) rediscovers
                    # from the files; plain ADD-mode MSCK would skip
                    # existing entries with stale locations
                    self.spark.sql(
                        f"MSCK REPAIR TABLE {self.qualified(name)} "
                        f"SYNC PARTITIONS"
                    )
        else:
            (
                df.write.mode("overwrite")
                .partitionBy(*partition_by)
                .parquet(self.location(name))
            )
        # A rewrite makes every session-cached frame derived from driver
        # tables potentially stale (persisted shingles, merged KG,
        # degrees, iteration results all read through this seam) — evict
        # them so the next access rebuilds from the new data.
        from .corpus import invalidate_session_caches

        invalidate_session_caches(self.spark)
