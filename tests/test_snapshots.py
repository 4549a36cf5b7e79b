"""The snapshot table format (plans/snapshots.py): Iceberg-semantics
commits over parquet — immutability, atomicity, time travel, metadata
pruning, expiry. These are the properties the 10^12-triple
materialization leans on; each is asserted directly against the
on-disk store, not through the pipeline."""

from __future__ import annotations

import json
import os
import pathlib

import pytest
from pyspark.sql import functions as F

from edgar_finance_ontology_spark.plans import snapshots as snap


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "part string, k int, v string"
    )


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def _mtimes(root):
    root = pathlib.Path(root)
    return {
        str(p.relative_to(root)): os.stat(p).st_mtime_ns
        for p in (root / "data").rglob("*.parquet")
    }


@pytest.fixture()
def store(tmp_path):
    return tmp_path / "tbl"


def test_overwrite_roundtrip_and_ids(spark, store):
    df = _df(spark, [("a", 1, "x"), ("b", 2, "y")])
    sid = snap.commit_overwrite(spark, store, df, ("part",))
    assert sid == 1
    assert snap.snapshot_ids(store) == [1]
    assert snap.latest_snapshot(store) == 1
    assert _norm(snap.read_snapshot(spark, store)) == _norm(df)


def test_patch_adds_files_only_and_time_travels(spark, store):
    v1 = _df(spark, [("a", 1, "x"), ("b", 2, "y"), ("b", 3, "z")])
    snap.commit_overwrite(spark, store, v1, ("part",))
    before = _mtimes(store)

    patch = _df(spark, [("b", 2, "Y2"), ("b", 3, "z")])
    sid = snap.commit_patch(
        spark, store, patch, ("part",),
        replaced=lambda pv: pv.get("part") == "b",
    )
    assert sid == 2

    # immutability: every v1 data file survives byte-untouched
    after = _mtimes(store)
    for rel, mt in before.items():
        assert after.get(rel) == mt, rel

    # latest = a-partition carried over by reference + new b files
    assert _norm(snap.read_snapshot(spark, store)) == _norm(
        _df(spark, [("a", 1, "x"), ("b", 2, "Y2"), ("b", 3, "z")])
    )
    # carried-over file entries are literally the same paths
    f1 = {f["path"] for f in snap.snapshot_meta(store, 1)["files"]
          if f["partition"]["part"] == "a"}
    f2 = {f["path"] for f in snap.snapshot_meta(store, 2)["files"]
          if f["partition"]["part"] == "a"}
    assert f1 == f2 and f1

    # time travel: v1 reads exactly as committed
    assert _norm(snap.read_snapshot(spark, store, snapshot_id=1)) \
        == _norm(v1)


def test_metadata_partition_pruning(spark, store):
    df = _df(spark, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")])
    snap.commit_overwrite(spark, store, df, ("part",))
    got = snap.read_snapshot(
        spark, store, partition_filter=lambda pv: pv["part"] in ("a", "c")
    )
    assert _norm(got) == _norm(df.where(F.col("part") != "b"))
    # pruning happens on the driver-side file list: the pruned plan
    # must reference no b-partition file
    b_files = {f["path"] for f in snap.snapshot_meta(store, 1)["files"]
               if f["partition"]["part"] == "b"}
    plan = got._jdf.queryExecution().toString()
    for rel in b_files:
        assert rel.split("/")[-1] not in plan
    # an all-false filter yields an EMPTY frame with the table schema
    none = snap.read_snapshot(
        spark, store, partition_filter=lambda pv: False
    )
    assert none.count() == 0
    assert none.schema == got.schema


def test_commit_conflict_is_detected(spark, store):
    snap.commit_overwrite(spark, store, _df(spark, [("a", 1, "x")]),
                          ("part",))
    # a racing writer already published v2: the loser must get a
    # conflict, not silently clobber it
    meta2 = dict(snap.snapshot_meta(store, 1), snapshot_id=2, parent=1)
    with open(pathlib.Path(store) / "_snapshots" / "v00000002.json",
              "w") as fh:
        json.dump(meta2, fh)
    with pytest.raises(snap.CommitConflict):
        snap._commit_meta(store, dict(meta2, snapshot_id=2))


def test_crashed_commit_leaves_readers_untouched(spark, store):
    v1 = _df(spark, [("a", 1, "x")])
    snap.commit_overwrite(spark, store, v1, ("part",))
    # simulate a writer that died after writing data files but before
    # publishing metadata: orphan parquet under data/, no new snapshot
    snap._write_data_files(
        spark, store, _df(spark, [("zz", 9, "orphan")]), ("part",)
    )
    assert snap.snapshot_ids(store) == [1]
    assert _norm(snap.read_snapshot(spark, store)) == _norm(v1)
    # expiry collects the orphans without disturbing live files
    res = snap.expire_snapshots(store, keep_last=2)
    assert res["removed_files"] >= 1
    assert _norm(snap.read_snapshot(spark, store)) == _norm(v1)


def test_rollback_is_a_new_snapshot(spark, store):
    v1 = _df(spark, [("a", 1, "x")])
    snap.commit_overwrite(spark, store, v1, ("part",))
    snap.commit_overwrite(spark, store, _df(spark, [("a", 1, "X2")]),
                          ("part",))
    sid = snap.rollback(spark, store, 1)
    assert sid == 3
    assert _norm(snap.read_snapshot(spark, store)) == _norm(v1)
    # history stayed linear — v2 is still there
    assert snap.snapshot_ids(store) == [1, 2, 3]


def test_expire_drops_unreferenced_files(spark, store):
    snap.commit_overwrite(spark, store, _df(spark, [("a", 1, "x")]),
                          ("part",))
    snap.commit_overwrite(spark, store, _df(spark, [("b", 2, "y")]),
                          ("part",))
    snap.commit_overwrite(spark, store, _df(spark, [("c", 3, "z")]),
                          ("part",))
    res = snap.expire_snapshots(store, keep_last=1)
    assert res["expired_snapshots"] == 2
    assert res["removed_files"] >= 2
    assert snap.snapshot_ids(store) == [3]
    assert _norm(snap.read_snapshot(spark, store)) == _norm(
        _df(spark, [("c", 3, "z")])
    )
    # expired versions are really gone
    with pytest.raises(FileNotFoundError):
        snap.snapshot_meta(store, 1)


def test_empty_commit_and_unpartitioned_table(spark, store):
    df = _df(spark, [])
    sid = snap.commit_overwrite(spark, store, df, ("part",))
    assert sid == 1
    empty = snap.read_snapshot(spark, store)
    assert empty.count() == 0
    assert empty.schema == df.schema
    # unpartitioned commit works too (no partition columns at all)
    sid = snap.commit_overwrite(
        spark, store, _df(spark, [("a", 1, "x")]), ()
    )
    assert sid == 2
    got = snap.read_snapshot(spark, store)
    assert _norm(got) == [("a", 1, "x")]
    assert snap.snapshot_meta(store, 2)["files"][0]["partition"] == {}


def test_snapshot_store_model_fuzz(spark, store):
    """Stateful fuzz vs an in-memory model: random interleavings of
    overwrite / patch / rollback / expire must keep every surviving
    snapshot readable with exactly its committed content."""
    import random

    rng = random.Random(7)
    parts = ["a", "b", "c", "d"]

    def rand_table(tag):
        return {
            p: [(p, i, f"{tag}-{p}{i}") for i in range(rng.randint(1, 3))]
            for p in rng.sample(parts, rng.randint(1, len(parts)))
        }

    def to_df(table):
        rows = [r for rs in table.values() for r in rs]
        return _df(spark, rows)

    model: dict = {}
    history: dict = {}
    for step in range(14):
        op = rng.choice(["overwrite", "patch", "patch", "rollback",
                         "expire"])
        if not history and op in ("rollback", "expire"):
            op = "overwrite"
        if op == "overwrite":
            model = rand_table(f"s{step}")
            sid = snap.commit_overwrite(spark, store, to_df(model),
                                        ("part",))
        elif op == "patch":
            repl = set(rng.sample(parts, rng.randint(1, 2)))
            newbits = {p: rows for p, rows in
                       rand_table(f"s{step}").items() if p in repl}
            model = {p: rows for p, rows in model.items()
                     if p not in repl}
            model.update(newbits)
            sid = snap.commit_patch(
                spark, store, to_df(newbits), ("part",),
                replaced=lambda pv: pv.get("part") in repl,
            )
        elif op == "rollback":
            target = rng.choice(sorted(history))
            model = history[target]
            sid = snap.rollback(spark, store, target)
        else:
            keep = rng.randint(1, 3)
            res = snap.expire_snapshots(store, keep_last=keep)
            survivors = snap.snapshot_ids(store)
            history = {i: t for i, t in history.items()
                       if i in survivors}
            assert res["live_snapshots"] == len(survivors)
            continue
        history[sid] = model
        # every surviving snapshot reads back exactly as committed
        for i in snap.snapshot_ids(store):
            got = _norm(snap.read_snapshot(spark, store, snapshot_id=i))
            want = sorted(r for rs in history[i].values() for r in rs)
            assert got == want, (step, op, i)
