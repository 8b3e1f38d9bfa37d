"""Catalog unit tests: atomicity, time travel, vacuum."""

import json

import pytest
from pyspark.sql import functions as F

from cex_crawler_spark.catalog import (
    APPEND,
    OVERWRITE,
    CommitConflictError,
    SnapshotCatalog,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = SnapshotCatalog(tmp_path)
    c.commit(0, {"t": (spark.range(5), OVERWRITE),
                 "log": (spark.range(2), APPEND)})
    c.commit(1, {"t": (spark.range(7), OVERWRITE),
                 "log": (spark.range(3), APPEND)})
    return c


def test_overwrite_and_append_semantics(spark, cat):
    assert cat.read(spark, "t").count() == 7
    assert cat.read(spark, "log").count() == 5  # 2 + 3


def test_time_travel(spark, cat):
    assert cat.read(spark, "t", version=1).count() == 5
    assert cat.read(spark, "log", version=1).count() == 2
    assert cat.manifest(1)["round"] == 0


def test_unreferenced_manifest_is_invisible(spark, cat, tmp_path):
    """A half-written commit (data dirs but no manifest) is never seen —
    the atomicity guarantee a kill relies on."""
    # simulate a crash: data written, manifest missing
    spark.range(100).write.parquet(str(tmp_path / "t" / "v000099"))
    assert cat.current_version() == 2
    assert cat.read(spark, "t").count() == 7  # still the committed state


def test_concurrent_commit_loses_cleanly(spark, cat, monkeypatch):
    """Optimistic concurrency: two writers racing to the same manifest
    version → exactly one wins; the loser gets CommitConflictError and
    the winner's state is untouched (its loser's data dirs are orphans)."""
    stale = cat.manifest()  # both writers read version 2

    winner = SnapshotCatalog(cat.root)
    winner.commit(2, {"t": (spark.range(9), OVERWRITE)})  # lands v3 first

    monkeypatch.setattr(cat, "manifest", lambda version=None: stale)
    with pytest.raises(CommitConflictError):
        cat.commit(2, {"t": (spark.range(1), OVERWRITE)})

    assert winner.current_version() == 3
    assert winner.read(spark, "t").count() == 9


def test_manifest_publish_never_crosses_writers(cat):
    """ADVICE r4 (high): with a SHARED tmp path, the link winner could
    durably publish the LOSER's manifest content (B's write_text
    truncated the same inode between A's write and A's link), and the
    loser's cleanup could raise FileNotFoundError instead of
    CommitConflictError.  Hammer the write→link window from two threads:
    the published manifest must always carry the winner's own content,
    the loser must always see a clean CommitConflictError, and no tmp
    files may survive."""
    import threading

    for it in range(30):
        v = cat.current_version() + 1
        results: dict[str, str] = {}
        barrier = threading.Barrier(2)

        def go(tag, v=v, it=it):
            m = {"version": v, "round": 99, "tables": {}, "who": tag}
            barrier.wait()
            try:
                cat._link_manifest(v, m, f"{tag}{it}")
                results[tag] = "won"
            except CommitConflictError:
                results[tag] = "lost"

        ts = [threading.Thread(target=go, args=(t,)) for t in ("a", "b")]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert sorted(results.values()) == ["lost", "won"], results
        winner = next(k for k, r in results.items() if r == "won")
        assert cat.manifest(v)["who"] == winner
    assert not list((cat.root / "_manifests").glob("*.tmp"))


def test_commit_conflict_auto_retry_append(spark, cat):
    """VERDICT r4 item 3: an append-only commit that loses the manifest
    race retries against the re-read state — both writers land, with
    serialized versions and BOTH appended paths visible."""
    other = SnapshotCatalog(cat.root)
    real = cat._link_manifest
    injected = {"done": False}

    def racing(version, manifest, attempt):
        if not injected["done"]:
            injected["done"] = True
            # another writer steals the version cat is about to link
            other.commit(5, {"log": (spark.range(4), APPEND)})
        return real(version, manifest, attempt)

    cat._link_manifest = racing
    v = cat.commit(6, {"log": (spark.range(10), APPEND)}, retry_conflicts=3)
    assert injected["done"]
    assert v == other.current_version() == 4  # serialized: v3 then v4
    # fixture 2+3, other's 4, cat's 10 — nothing lost on either side
    assert cat.read(spark, "log").count() == 19
    assert cat.manifest(3)["round"] == 5 and cat.manifest(4)["round"] == 6


def test_commit_conflict_overwrite_never_retries(spark, cat):
    """OVERWRITE under concurrency is a lost-update — auto-retry must
    refuse and surface the conflict even when retries were requested."""
    other = SnapshotCatalog(cat.root)
    real = cat._link_manifest

    def racing(version, manifest, attempt):
        if other.current_version() == cat.current_version():
            other.commit(5, {"t": (spark.range(4), OVERWRITE)})
        return real(version, manifest, attempt)

    cat._link_manifest = racing
    with pytest.raises(CommitConflictError):
        cat.commit(6, {"t": (spark.range(10), OVERWRITE)}, retry_conflicts=3)
    assert other.read(spark, "t").count() == 4  # winner's state intact


def test_parallel_write_failures_all_surface(spark, cat):
    """ADVICE r3: when several parallel table writes fail, every root
    cause must surface (ExceptionGroup), not one arbitrary exception —
    and no manifest may flip."""

    def boom_a():
        raise ValueError("write A failed")

    def boom_b():
        raise KeyError("write B failed")

    before = cat.current_version()
    with pytest.raises(ExceptionGroup) as ei:
        cat.commit(
            2,
            {
                "bad_a": (boom_a, OVERWRITE),
                "bad_b": (boom_b, OVERWRITE),
                "ok": (spark.range(3), OVERWRITE),
            },
        )
    kinds = {type(e) for e in ei.value.exceptions}
    assert kinds == {ValueError, KeyError}
    assert cat.current_version() == before  # atomicity: nothing committed


def test_compact_append_table(spark, cat):
    """Compaction rewrites an append table's per-round directories into
    one, row-identical, atomically, with time travel intact and future
    appends still working (the Iceberg rewrite_data_files analog)."""
    for i in range(3):
        cat.commit(2 + i, {"log": (spark.range(i * 10, i * 10 + 4), APPEND)})
    before = sorted(r["id"] for r in cat.read(spark, "log").collect())
    n_paths_before = len(cat.manifest()["tables"]["log"]["paths"])
    assert n_paths_before == 5  # fixture 2 + 3 appended rounds
    pre_version = cat.current_version()

    v = cat.compact(spark, "log", target_file_mb=128)
    assert v == pre_version + 1
    entry = cat.manifest()["tables"]["log"]
    assert len(entry["paths"]) == 1
    import pathlib
    files = list(pathlib.Path(entry["paths"][0]).rglob("*.parquet"))
    assert len(files) == 1  # tiny table → single target-sized file
    assert sorted(r["id"] for r in cat.read(spark, "log").collect()) == before
    # time travel to the pre-compaction layout still reads
    assert len(cat.read(spark, "log", version=pre_version).collect()) == len(before)
    # appends continue on the compacted list
    cat.commit(9, {"log": (spark.range(100, 103), APPEND)})
    assert cat.read(spark, "log").count() == len(before) + 3
    # vacuum prunes the pre-compaction dirs once out of retention
    deleted = cat.vacuum(keep_versions=1)
    assert any("/log/" in d for d in deleted)
    assert cat.read(spark, "log").count() == len(before) + 3


def test_vacuum_keeps_recent_reachable(spark, cat):
    deleted = cat.vacuum(keep_versions=1)
    # v1's overwritten t-version is deleted; append history of log stays
    # reachable from the latest manifest
    assert any("/t/v000001" in d for d in deleted)
    assert cat.read(spark, "t").count() == 7
    assert cat.read(spark, "log").count() == 5
    with pytest.raises(Exception):
        cat.read(spark, "t", version=1).count()


def test_frontier_partition_pruning(spark, tmp_path):
    """Frontier commits hive-partitioned by host_bucket: a host-targeted
    scan prunes to that bucket's files (SURVEY §4 layout)."""
    from cex_crawler_spark.plans.driver import bootstrap
    from cex_crawler_spark.plans.round import HOST_BUCKETS
    from cex_crawler_spark.synth import gen_frontier
    from pyspark.sql import functions as F

    cat = SnapshotCatalog(tmp_path / "cat")
    bootstrap(cat, gen_frontier(spark, 500, n_payloads=50), "2025-08-29 00:00:00")
    frontier = cat.read(spark, "frontier")
    assert "host_bucket" in frontier.columns
    one = frontier.filter(F.col("host_bucket") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate lands in PartitionFilters (directory pruning at
    # the file index), NOT in DataFilters/post-scan
    assert "PartitionFilters: [isnotnull(host_bucket" in plan
    assert "= 3)]" in plan
    # pruning must not lose rows: union of buckets == full read
    n_full = frontier.count()
    n_sum = sum(
        frontier.filter(F.col("host_bucket") == b).count()
        for b in range(HOST_BUCKETS)
    )
    assert n_full == n_sum


# ------------------------------------------------------------ incremental


def test_read_changes_append_window(spark, cat):
    """Incremental scan returns exactly the rows appended in the
    version window — cost proportional to new data, not the table."""
    from cex_crawler_spark.catalog import IncrementalReadError  # noqa: F401

    cat.commit(2, {"log": (spark.range(10, 14), APPEND)})  # v3
    cat.commit(3, {"log": (spark.range(20, 21), APPEND)})  # v4

    got = {r.id for r in cat.read_changes(spark, "log", 2).collect()}
    assert got == {10, 11, 12, 13, 20}
    got = {r.id for r in cat.read_changes(spark, "log", 2, 3).collect()}
    assert got == {10, 11, 12, 13}
    # from the table's birth: the full table
    assert cat.read_changes(spark, "log", 0).count() == 10
    # empty window: zero rows, schema intact
    empty = cat.read_changes(spark, "log", 4, 4)
    assert empty.count() == 0
    assert empty.schema == cat.read(spark, "log").schema


def test_read_changes_refuses_rewrites(spark, cat):
    """Overwrite and compaction rewrite the path set — the path diff
    would return old rows as 'new', so the read must refuse."""
    from cex_crawler_spark.catalog import IncrementalReadError

    cat.commit(2, {"t": (spark.range(3), OVERWRITE)})  # v3 rewrites t
    with pytest.raises(IncrementalReadError):
        cat.read_changes(spark, "t", 2)
    # but the window AFTER the overwrite is pure-append again
    cat.commit(3, {"t": (spark.range(100, 102), APPEND)})  # v4
    got = {r.id for r in cat.read_changes(spark, "t", 3).collect()}
    assert got == {100, 101}

    cat.compact(spark, "log")  # v5 rewrites log's path list
    with pytest.raises(IncrementalReadError):
        cat.read_changes(spark, "log", 2)


def test_read_changes_bad_window(spark, cat):
    with pytest.raises(ValueError):
        cat.read_changes(spark, "log", 2, 1)
    with pytest.raises(KeyError):
        cat.read_changes(spark, "nope", 0)


def test_read_merge_schema_additive_evolution(spark, cat):
    """An append that adds a column (additive schema evolution):
    merge_schema surfaces it, NULL-filled for pre-evolution rows."""
    evolved = spark.range(30, 32).select(
        F.col("id"), F.lit("new").alias("tag")
    )
    cat.commit(2, {"log": (evolved, APPEND)})
    df = cat.read(spark, "log", merge_schema=True)
    assert set(df.columns) == {"id", "tag"}
    assert df.count() == 7  # 2 + 3 + 2
    assert df.filter(F.col("tag").isNull()).count() == 5
    assert {r.id for r in df.filter(F.col("tag") == "new").collect()} == \
        {30, 31}


# ------------------------------------------------- equality deletes (r5)


def _ids(spark, df):
    return sorted(r["id"] for r in df.collect())


def test_delete_rows_merge_on_read_and_time_travel(spark, cat):
    """delete_rows removes matching keys from reads WITHOUT rewriting
    data files; time travel to a pre-delete version still sees them."""
    v_before = cat.current_version()
    paths_before = cat.manifest()["tables"]["log"]["paths"]
    cat.delete_rows("log", spark.range(2).select("id"))  # ids 0,1 (×2 files)
    assert cat.manifest()["tables"]["log"]["paths"] == paths_before
    # log = append of range(2) + range(3): multiset {0,0,1,1,2}
    assert _ids(spark, cat.read(spark, "log")) == [2]
    assert _ids(spark, cat.read(spark, "log", version=v_before)) == [
        0, 0, 1, 1, 2,
    ]


def test_delete_does_not_shadow_later_appends(spark, cat):
    """Sequence-aware: a key re-appended AFTER the delete is alive
    (Iceberg v2 sequence-number semantics) — a naive whole-table
    anti-join would silently swallow the new rows."""
    cat.delete_rows("log", spark.range(2).select("id"))
    cat.commit(2, {"log": (spark.range(2), APPEND)})  # re-add 0,1
    assert _ids(spark, cat.read(spark, "log")) == [0, 1, 2]
    # a SECOND delete hides the re-added rows again, but not ones
    # appended after it
    cat.delete_rows("log", spark.range(1).select("id"))  # id 0
    cat.commit(3, {"log": (spark.range(1), APPEND)})
    assert _ids(spark, cat.read(spark, "log")) == [0, 1, 2]


def test_compact_materializes_deletes(spark, cat):
    cat.delete_rows("log", spark.range(2).select("id"))
    cat.compact(spark, "log", target_file_mb=128)
    entry = cat.manifest()["tables"]["log"]
    assert not entry.get("deletes")
    assert _ids(spark, cat.read(spark, "log")) == [2]
    # post-materialization appends of deleted keys are alive
    cat.commit(9, {"log": (spark.range(1), APPEND)})
    assert _ids(spark, cat.read(spark, "log")) == [0, 2]


def test_read_changes_refuses_delete_window(spark, cat):
    from cex_crawler_spark.catalog import IncrementalReadError

    v0 = cat.current_version()
    cat.delete_rows("log", spark.range(1).select("id"))
    with pytest.raises(IncrementalReadError):
        cat.read_changes(spark, "log", v0)
    # windows strictly after the delete work again
    v1 = cat.current_version()
    cat.commit(2, {"log": (spark.range(4), APPEND)})
    assert cat.read_changes(spark, "log", v1).count() == 4


def test_delete_key_spec_is_fixed_and_vacuum_keeps_delete_files(
    spark, cat, tmp_path
):
    cat.delete_rows("log", spark.range(1).select("id"))
    with pytest.raises(ValueError):
        cat.delete_rows(
            "log", spark.range(1).select(F.col("id").alias("other"))
        )
    # churn versions so vacuum has something to drop, then check the
    # referenced delete file survives and reads still apply it
    for r in range(3, 6):
        cat.commit(r, {"t": (spark.range(r), OVERWRITE)})
    cat.vacuum(keep_versions=2)
    assert _ids(spark, cat.read(spark, "log")) == [1, 1, 2]
    with pytest.raises(KeyError):
        cat.delete_rows("nope", spark.range(1))
