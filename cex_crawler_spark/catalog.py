"""Snapshot catalog — atomic multi-table commits on parquet + manifest JSON.

Plays the role Iceberg snapshots play in the production design (SURVEY §4):
every crawl round commits frontier', seen-delta, results, metrics and
lineage ATOMICALLY — either the whole round is visible or none of it —
so a killed run resumes bit-identically from the last committed round.
The reference has no such guarantee (a crash can half-write a JSON file,
/root/reference/exchange/base_scraper.py:184-196).

Protocol:
- data files first: each table version writes parquet under
  ``<root>/<table>/v<N>/`` (a new directory per commit — never mutated);
- manifest last: ``<root>/_manifests/v<N>.json`` is written to a temp
  file and ``os.link``ed into place — an atomic create-if-absent, so
  two writers racing to commit the same version see exactly one winner
  (``CommitConflictError`` for the loser — Iceberg-style optimistic
  concurrency).  The current state is the highest-numbered manifest;
  orphan data dirs from a crash or a lost race are unreferenced and
  harmless (vacuumable).
- append tables (``seen``, ``results``, ``lineage``, ``metrics``) list
  ALL their data paths in the manifest; overwrite tables (``frontier``)
  list only the newest.

The API mirrors what the Iceberg swap would need (read / commit /
current round), so moving to real Iceberg is a one-module change.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

OVERWRITE = "overwrite"
APPEND = "append"


class IncrementalReadError(RuntimeError):
    """Raised when an incremental read spans a non-append rewrite
    (overwrite or compaction) — the path diff would return rewritten
    files containing OLD rows, so the read is refused instead."""


class CommitConflictError(RuntimeError):
    """Another writer committed the same manifest version first.

    The Iceberg-style optimistic-concurrency failure: data files are
    write-once under version-named dirs, so the loser's files are
    orphans (harmless, vacuumable) and the catalog state is untouched.
    Callers retry by re-reading the current manifest and re-committing
    against it."""


class SnapshotCatalog:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        (self.root / "_manifests").mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- manifests

    def _manifest_path(self, version: int) -> Path:
        return self.root / "_manifests" / f"v{version:06d}.json"

    def current_version(self) -> int:
        versions = [
            int(p.stem[1:]) for p in (self.root / "_manifests").glob("v*.json")
        ]
        return max(versions, default=0)

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "round": -1, "tables": {}}
        return json.loads(self._manifest_path(v).read_text())

    def current_round(self) -> int:
        return self.manifest()["round"]

    # ----------------------------------------------------------------- reads

    def has_table(self, table: str) -> bool:
        return table in self.manifest()["tables"]

    def read(
        self,
        spark: SparkSession,
        table: str,
        version: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Read a table — optionally AS OF an earlier manifest version
        (snapshot time travel, the Iceberg `VERSION AS OF` analog).

        ``merge_schema=True`` unions the schemas of every referenced
        file (additive schema evolution: an append that introduced a
        new column surfaces it as NULL for older rows — Iceberg
        ``add_column`` semantics).  Off by default: schema merging reads
        every file footer up front, and a table written under one
        schema doesn't need it."""
        entry = self.manifest(version)["tables"].get(table)
        if entry is None or not entry["paths"]:
            raise KeyError(f"table {table!r} not in catalog")
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        deletes = entry.get("deletes") or []
        if not deletes:
            return reader.parquet(*entry["paths"])
        # merge-on-read equality deletes (Iceberg v2 analog): a delete
        # file applies to a data file iff the data file was committed AT
        # OR BEFORE the delete (file seq <= delete seq) — so a key
        # re-appended AFTER a delete is alive, exactly like Iceberg
        # sequence numbers.  Delete seqs are ascending (append order),
        # so each data file's applicable deletes are a SUFFIX of the
        # list; files group by the suffix start, one anti-join per
        # group (the seen-set anti-join shape — delete-key sets are
        # small and broadcastable, AQE picks BHJ LeftAnti).  Group
        # count is bounded by delete COMMITS since the last rewrite,
        # which compaction resets to zero by materializing.
        import bisect

        key_cols = entry["delete_keys"]
        paths = entry["paths"]
        seqs = entry.get("path_seqs") or [0] * len(paths)
        del_seqs = [d["seq"] for d in deletes]
        groups: dict[int, list[str]] = {}
        for p, s in zip(paths, seqs):
            groups.setdefault(bisect.bisect_left(del_seqs, s), []).append(p)
        parts = []
        for i, ps in sorted(groups.items()):
            df = reader.parquet(*ps)
            if i < len(deletes):
                keys = spark.read.parquet(
                    *[d["path"] for d in deletes[i:]]
                ).select(*key_cols)
                df = df.join(keys, on=key_cols, how="left_anti")
            parts.append(df)
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out

    def read_changes(
        self,
        spark: SparkSession,
        table: str,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Rows appended to ``table`` AFTER ``from_version``, up to and
        including ``to_version`` (default: current) — the Iceberg
        incremental-scan analog (``incremental append scan`` between two
        snapshot ids).

        This is how downstream consumers (the curation/packing pipeline,
        a metrics exporter) keep up with a long-running crawl without
        re-reading the whole table each round: at 100 TB a results table
        holds thousands of per-round directories, and the incremental
        scan opens ONLY the directories committed in the window — cost
        proportional to the new data, not the table.

        Every append commit adds exactly one immutable directory to the
        table's manifest path list, so the change set is the path-list
        difference between the two manifests.  Correct ONLY over
        pure-append history: an OVERWRITE or :meth:`compact` between the
        two versions rewrites the path set, and the diff would return
        rewritten files full of OLD rows — detected (the old version's
        paths are no longer a subset of the new version's) and refused
        with :class:`IncrementalReadError`, exactly as Iceberg's
        incremental scan refuses REPLACE/OVERWRITE snapshots.
        """
        if to_version is None:
            to_version = self.current_version()
        if not 0 <= from_version <= to_version:
            raise ValueError(
                f"need 0 <= from_version <= to_version, got "
                f"{from_version}..{to_version}"
            )
        entry = self.manifest(to_version)["tables"].get(table)
        if entry is None:
            raise KeyError(f"table {table!r} not in catalog @ v{to_version}")
        old = self.manifest(from_version)["tables"].get(table)
        if (old or {}).get("deletes") != entry.get("deletes"):
            # a delete in the window is not an append: rows the consumer
            # already read at from_version have since been deleted, and
            # a path diff cannot express that — refuse, like Iceberg's
            # incremental scan on a DELETE snapshot
            raise IncrementalReadError(
                f"table {table!r} had rows deleted between "
                f"v{from_version} and v{to_version}; incremental read is "
                "only defined over pure-append history — fall back to a "
                "full read of the newer version"
            )
        old_paths = set(old["paths"]) if old else set()
        if not old_paths.issubset(entry["paths"]):
            raise IncrementalReadError(
                f"table {table!r} was overwritten or compacted between "
                f"v{from_version} and v{to_version}; incremental read is "
                "only defined over pure-append history — fall back to a "
                "full read of the newer version"
            )
        new_paths = [p for p in entry["paths"] if p not in old_paths]
        if not new_paths:
            # schema-stable empty result (no table scan: parquet footer
            # read only)
            return spark.read.parquet(*entry["paths"]).limit(0)
        return spark.read.parquet(*new_paths)

    # ---------------------------------------------------------------- commit

    def commit(
        self,
        round_id: int,
        writes: dict[str, tuple[DataFrame | Callable[[], DataFrame], str]],
        extra: dict | None = None,
        partition_by: dict[str, list[str]] | None = None,
        serial_first: list[str] | None = None,
        retry_conflicts: int = 0,
    ) -> int:
        """Atomically commit ``{table: (df, OVERWRITE|APPEND)}`` as one round.

        DataFrames are materialized (parquet write = the action) before
        the manifest flips; returns the new manifest version.
        ``partition_by`` maps table → hive-partition columns (the Iceberg
        partition-spec analog): scans filtered on those columns prune
        whole directories (SURVEY §4 frontier layout).
        ``serial_first`` names tables whose plans materialize shared
        caches (e.g. the fetch stage): they write sequentially FIRST; the
        remaining writes — cheap scans over those caches — run in
        parallel threads, overlapping their per-job fixed cost.  Data
        files are still all-or-nothing: the manifest flips only after
        every write returns.
        ``retry_conflicts`` bounds automatic retries after a lost
        manifest race (Iceberg commit-retry semantics): the already
        written data files are REUSED — only the manifest merge re-reads
        the new current state and re-links at the next version.  Retry
        is offered only when every table mode is APPEND; an OVERWRITE
        table under concurrency is a lost-update the caller must
        re-derive from the winner's state, so those still raise
        :class:`CommitConflictError` immediately.
        """
        m = self.manifest()
        version = m["version"] + 1
        # unique per-ATTEMPT data dirs (the Iceberg file-naming pattern):
        # two writers racing to commit the same version must not share
        # data paths, or the conflict loser clobbers the winner's files
        # before the manifest link detects the race.  The loser's dirs
        # become unreferenced orphans — vacuumable, never visible.
        import uuid

        attempt = uuid.uuid4().hex[:8]

        def _is_local_empty(df: DataFrame) -> bool:
            # a schema-only empty plan (LocalRelation with no rows) —
            # the shape run_round's drained-frontier write produces.
            # Detected from the optimized plan on the driver, no job.
            try:
                plan = df._jdf.queryExecution().optimizedPlan()
                return (
                    plan.getClass().getSimpleName() == "LocalRelation"
                    and plan.data().isEmpty()
                )
            except Exception:
                return False

        def write_one(table: str) -> str:
            df, _mode = writes[table]
            if callable(df):
                # lazily-built plan: resolved at write time, AFTER the
                # serial_first writes — lets a caller swap in a cheaper
                # plan based on what those writes observed (e.g. an
                # empty-frontier write when the round deferred nothing)
                df = df()
            path = str(self.root / table / f"v{version:06d}-{attempt}")
            cols = (partition_by or {}).get(table)
            if cols and _is_local_empty(df):
                # skip the dynamic-partition attempt entirely: a
                # zero-row partitioned write produces no data file and
                # the fallback below rewrites flat anyway — paying the
                # ~0.5 s fixed write-path cost twice per drained round
                df.write.mode("overwrite").parquet(path)
                return path
            writer = df.write.mode("overwrite")
            if cols:
                writer = writer.partitionBy(*cols)
            writer.parquet(path)
            if cols and not any(Path(path).rglob("*.parquet")):
                # dynamic-partition write of ZERO rows leaves no data file
                # (so no schema to read back); emit a schema-bearing empty
                # file BUILT FROM THE SCHEMA — rewriting `df` itself would
                # re-execute its whole plan a second time (measured: the
                # drain's empty-frontier write re-ran a full-frontier
                # anti-join just to write nothing)
                df.sparkSession.createDataFrame([], df.schema).write.mode(
                    "overwrite"
                ).parquet(path)
            return path

        serial = [t for t in (serial_first or []) if t in writes]
        rest = [t for t in writes if t not in serial]
        paths = {t: write_one(t) for t in serial}
        if len(rest) > 1:
            # InheritableThread, not ThreadPoolExecutor: Spark local
            # properties (job group/description) are per-thread under
            # pinned-thread mode, so pool threads would launch write jobs
            # OUTSIDE the caller's `round-<id>` job group and escape the
            # per-round job accounting (ADVICE r2).  InheritableThread
            # copies the creating thread's properties at start().
            from pyspark import InheritableThread

            errors: dict[str, BaseException] = {}

            def run(table: str) -> None:
                try:
                    paths[table] = write_one(table)
                except BaseException as e:  # re-raised on the caller
                    errors[table] = e

            threads = [InheritableThread(target=run, args=(t,)) for t in rest]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            if len(errors) == 1:
                raise next(iter(errors.values()))
            if errors:
                # every failure surfaces — raising one arbitrary
                # exception hid the other threads' root causes (ADVICE r3)
                raise ExceptionGroup(
                    "parallel table writes failed: "
                    + ", ".join(sorted(errors)),
                    list(errors.values()),
                )
        else:
            for t in rest:
                paths[t] = write_one(t)

        all_append = all(mode == APPEND for _, mode in writes.values())
        while True:
            # re-read the CURRENT manifest on every attempt: a retry
            # after a lost race must merge against the winner's state
            # (its appended paths included), not the stale pre-race view
            base = self.manifest()
            version = base["version"] + 1
            tables = {k: dict(v) for k, v in base["tables"].items()}
            for table, (df, mode) in writes.items():
                path = paths[table]
                if mode == APPEND and table in tables:
                    # carry delete files / key spec forward, and record
                    # the new path's sequence number: deletes committed
                    # EARLIER must not shadow rows appended now
                    # (merge-on-read, see read()).  Pre-delete-era
                    # entries have no path_seqs — seq 0 for those paths
                    # is conservative and correct (every delete applies).
                    e = dict(tables[table])
                    prior = e.get("path_seqs") or [0] * len(e["paths"])
                    e["paths"] = e["paths"] + [path]
                    e["path_seqs"] = prior + [version]
                    tables[table] = e
                else:
                    # overwrite rewrites the row set: accumulated
                    # deletes are materialized into it (read() applied
                    # them to whatever produced ``df``) and cleared
                    tables[table] = {
                        "paths": [path], "path_seqs": [version]
                    }
            new_manifest = {
                "version": version,
                "round": round_id,
                "tables": tables,
                # durable table properties (Iceberg-style): carried
                # forward through EVERY commit unless the writer
                # overrides them.  The streaming sink's exactly-once
                # guard depends on this — its per-table high-water batch
                # id must survive interleaved non-stream commits, or a
                # sink-commit → other-commit → crash sequence would
                # replay the last batch as new (double append).
                **{
                    k: base[k] for k in ("stream_batches",) if k in base
                },
                **(extra or {}),
            }
            try:
                self._link_manifest(version, new_manifest, attempt)
                return version
            except CommitConflictError:
                if retry_conflicts > 0 and all_append:
                    retry_conflicts -= 1
                    continue
                raise

    def delete_rows(
        self,
        table: str,
        keys: DataFrame,
        retry_conflicts: int = 0,
    ) -> int:
        """Commit an EQUALITY-DELETE file against ``table`` — the
        Iceberg v2 merge-on-read analog: rows matching any key in
        ``keys`` (joined on its column names) disappear from subsequent
        :meth:`read`\\ s without rewriting a single data file.  At 100 TB
        a point-delete (GDPR takedown, a poisoned host's pages, a
        recalled image) must not cost a table rewrite; the delete is one
        tiny parquet of keys plus a manifest flip.

        Semantics (sequence-aware, like Iceberg): the delete applies to
        rows in data files committed at or before it — a key re-appended
        LATER is alive.  Time travel to a pre-delete version still sees
        the rows.  :meth:`compact` (or any overwrite) materializes
        accumulated deletes and clears them; :meth:`read_changes`
        refuses windows spanning a delete.  Key columns are fixed by the
        first delete against the table (one equality spec per table —
        mixed specs would need per-file scopes).

        Concurrency matches :meth:`commit`: per-attempt immutable delete
        file, atomic manifest link, optional bounded retry re-merging
        against the winner's state (safe — a delete composes with
        concurrent appends by sequence number).
        """
        import uuid

        if not self.has_table(table):
            raise KeyError(f"table {table!r} not in catalog")
        key_cols = list(keys.columns)
        attempt = uuid.uuid4().hex[:8]
        path = str(
            self.root / table
            / f"delete-v{self.current_version() + 1:06d}-{attempt}"
        )
        keys.dropDuplicates().write.mode("overwrite").parquet(path)
        while True:
            base = self.manifest()
            version = base["version"] + 1
            tables = {k: dict(v) for k, v in base["tables"].items()}
            e = tables.get(table)
            if e is None:
                raise KeyError(f"table {table!r} not in catalog")
            spec = e.get("delete_keys")
            if spec is not None and list(spec) != key_cols:
                raise ValueError(
                    f"table {table!r} already has equality-delete key "
                    f"spec {spec}; got {key_cols}"
                )
            e["deletes"] = (e.get("deletes") or []) + [
                {"path": path, "seq": version}
            ]
            e["delete_keys"] = key_cols
            new_manifest = {
                "version": version,
                "round": base["round"],
                "tables": tables,
                # durable properties ride through, same as commit();
                # bloom stays valid — it is a SUPERSET guarantee and
                # deleting rows only shrinks the true set
                **{
                    k: base[k]
                    for k in ("stream_batches", "bloom")
                    if k in base
                },
            }
            try:
                self._link_manifest(version, new_manifest, attempt)
                return version
            except CommitConflictError:
                if retry_conflicts > 0:
                    retry_conflicts -= 1
                    continue
                raise

    def _link_manifest(
        self, version: int, manifest: dict, attempt: str
    ) -> None:
        """Atomically publish ``manifest`` as version ``version`` or
        raise :class:`CommitConflictError` if another writer got there
        first.  The temp file is per-ATTEMPT (ADVICE r4 high): a shared
        ``v<N>.json.tmp`` let writer B's ``write_text`` truncate the
        same inode between writer A's write and A's ``os.link`` — A
        "won" the link but durably published B's manifest content."""
        tmp = self.root / "_manifests" / f"v{version:06d}.json.{attempt}.tmp"
        tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
        try:
            # link(2) fails with EEXIST if the target exists — an ATOMIC
            # create-if-absent, unlike rename(2) which silently clobbers.
            # Two writers racing to commit version N: exactly one link
            # succeeds; the loser's data dirs are unreferenced orphans.
            os.link(tmp, self._manifest_path(version))
        except FileExistsError:
            # missing_ok: with the old SHARED tmp the winner had already
            # unlinked it, so the loser's unlink raised FileNotFoundError
            # and masked the conflict; per-attempt tmps make this a
            # belt-and-braces guard only
            tmp.unlink(missing_ok=True)
            raise CommitConflictError(
                f"manifest v{version} was committed concurrently — "
                "re-read the catalog and retry the commit"
            ) from None
        tmp.unlink(missing_ok=True)

    def amend(self, version: int, extra: dict) -> None:
        """Merge audit-only keys (e.g. round stats) into an existing
        manifest, atomically.  Never used for tables/round — resume
        correctness cannot depend on amended fields."""
        import uuid

        m = self.manifest(version)
        m.update(extra)
        # per-attempt tmp for the same reason as _link_manifest: two
        # amenders sharing one tmp could publish each other's content
        tmp = self.root / "_manifests" / (
            f"v{version:06d}.json.{uuid.uuid4().hex[:8]}.tmp"
        )
        tmp.write_text(json.dumps(m, indent=1, sort_keys=True))
        os.rename(tmp, self._manifest_path(version))

    # ------------------------------------------------------------- compact

    def compact(
        self,
        spark: SparkSession,
        table: str,
        target_file_mb: int = 128,
        sort_by: list[str] | None = None,
        zorder: bool = False,
    ) -> int:
        """Rewrite an append table's accumulated per-round files into
        few ``target_file_mb``-sized files (the Iceberg
        ``rewrite_data_files`` analog).

        A long crawl appends one parquet directory per round: after 10⁴
        rounds every scan opens 10⁴ directories of round-sized (often
        tiny) files — at 100 TB the file-open/list overhead dominates
        small reads and planning.  Compaction reads the current table,
        ``coalesce``s to ⌈bytes / target⌉ files (no shuffle — merging
        partitions, not redistributing rows), writes ONE new directory
        and commits a manifest version whose path list is just that
        directory.  Properties: atomic (manifest flip), row-identical
        (same data, new layout), time-travel intact (older manifests
        still reference the old dirs until :meth:`vacuum`), and future
        appends keep working (they append to the shortened path list).

        ``sort_by`` opts into a DATA-SKIPPING layout (the Iceberg
        ``rewrite_data_files(strategy => 'sort')`` analog): rows are
        range-partitioned and sorted on the given columns, so each
        output file covers a narrow, disjoint value range and parquet
        footer min/max stats let later filtered scans skip whole files.
        Costs one shuffle (the plain path is shuffle-free ``coalesce``)
        — pay it when the table is read selectively more than once.
        ``zorder=True`` with exactly two ``sort_by`` columns sorts by
        the Morton interleave instead (functions/zorder.py): per-file
        ranges are bounded on BOTH columns, the right layout when
        filters come on either dimension.
        """
        m = self.manifest()
        entry = m["tables"].get(table)
        if entry is None:
            raise KeyError(f"table {table!r} not in catalog")
        n_bytes = 0
        for p in entry["paths"]:
            root = Path(p)
            if root.exists():
                n_bytes += sum(
                    f.stat().st_size for f in root.rglob("*.parquet")
                )
        n_files = max(1, -(-n_bytes // (target_file_mb * 1024 * 1024)))
        df = self.read(spark, table)
        if zorder:
            if not sort_by or len(sort_by) != 2:
                raise ValueError("zorder=True needs exactly two sort_by "
                                 "columns")
            from pyspark.sql import functions as F

            from .functions.zorder import morton2

            df = df.withColumn(
                "__z", morton2(F.col(sort_by[0]), F.col(sort_by[1]))
            )
            # Deterministic near-equal z-ranges: bin on percentile_approx
            # boundaries (mergeable sketch, one tiny agg) instead of
            # letting RangePartitioner row-sample the continuous Morton
            # key — its run-dependent samples occasionally produce a fat
            # partition whose z-span projects to wide x/y ranges and
            # ruins file skipping (observed as suite-order-dependent
            # pruning flakiness).  The range exchange then only has to
            # split an already-balanced 0..n-1 int.
            if int(n_files) > 1:
                qs = [i / int(n_files) for i in range(1, int(n_files))]
                bounds = (
                    df.select(
                        F.percentile_approx("__z", qs, 10000).alias("b")
                    ).first()["b"]
                    or []
                )
                bin_expr = F.lit(0)
                for b in bounds:
                    bin_expr = bin_expr + (F.col("__z") > F.lit(b)).cast(
                        "int"
                    )
                df = (
                    df.withColumn("__bin", bin_expr)
                    .repartitionByRange(int(n_files), "__bin", "__z")
                    .drop("__bin")
                )
            df = df.sortWithinPartitions("__z").drop("__z")
        elif sort_by:
            df = df.repartitionByRange(
                int(n_files), *sort_by
            ).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(int(n_files))
        # carry the Bloom sidecar reference forward: compaction changes
        # layout, not keys, so the bitmap's superset invariant holds —
        # dropping the reference would silently cost resumes the sidecar
        # (cold rebuild fallback) and let vacuum prune a live bitmap
        extra = {"bloom": m["bloom"]} if "bloom" in m else None
        return self.commit(
            m["round"], {table: (df, OVERWRITE)}, extra=extra
        )

    # --------------------------------------------------------------- vacuum

    def vacuum(self, keep_versions: int = 2) -> list[str]:
        """Delete data directories unreachable from the newest
        ``keep_versions`` manifests (snapshot expiry — bounds storage at
        one-overwritten-table-version per round otherwise).  Old manifests
        themselves are kept (tiny) so lineage stays auditable; reading a
        vacuumed version raises on the missing paths.

        Returns the deleted paths.
        """
        import shutil

        current = self.current_version()
        keep = set()
        for v in range(max(1, current - keep_versions + 1), current + 1):
            for entry in self.manifest(v)["tables"].values():
                keep.update(entry["paths"])
                keep.update(d["path"] for d in entry.get("deletes") or [])
        deleted = []
        for table_dir in self.root.iterdir():
            # "_"-prefixed dirs are catalog metadata (manifests, bloom
            # sidecars), not table data — handled separately below
            if table_dir.name.startswith("_") or not table_dir.is_dir():
                continue
            for vdir in table_dir.iterdir():
                if str(vdir) not in keep:
                    shutil.rmtree(vdir)
                    deleted.append(str(vdir))
        bloom_dir = self.root / "_bloom"
        if bloom_dir.is_dir():
            keep_blooms = set()
            for v in range(max(1, current - keep_versions + 1), current + 1):
                entry = self.manifest(v).get("bloom")
                if entry:
                    keep_blooms.add(entry["file"])
            for f in bloom_dir.iterdir():
                if f.name not in keep_blooms:
                    f.unlink()
                    deleted.append(str(f))
        return deleted
