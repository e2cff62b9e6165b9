"""Shallow clone (round 12) — Delta ``CREATE TABLE ... SHALLOW CLONE``
analog on the share-by-reference TableStore.

Reference behavior being paralleled: the reference's staging rebuilds
copy tables wholesale (include/scripts/sync_data.py full re-syncs); a
zero-copy clone is the lakehouse-native form — O(1) objects written at
any size, then fully independent evolution. Unlike Delta, where VACUUM
on the source silently breaks shallow clones, reclamation here is
reference-counted across the dependency: the source tombstones
referenced generations and reclaims them only after the last clone
reference is gone.
"""

from __future__ import annotations

import glob
import os
import random

import pytest
from pyspark.sql import functions as F

from taico_data_integration_spark.ops.incremental import TableStore


def _mk_src(spark, root, partition_by=None):
    store = TableStore(spark, str(root))
    df = spark.range(0, 1_000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "CAST(id % 7 AS INT) AS n"
    )
    store.write("t", df.repartition(4), partition_by=partition_by)
    if partition_by is None:
        store.optimize_layout("t", ["k"], num_files=4)
    return store


def test_clone_zero_copy_equal_reads(spark, tmp_path):
    """The clone's first version REFERENCES the source's files — zero
    parquet written — and reads identically, through the source's whole
    ALTER-event stack (rename mapping, DEFAULT back-fill, widened types)
    and with its CHECK constraints copied."""
    store = _mk_src(spark, tmp_path)
    store.add_columns("t", {"lang": ("string", "en")})
    store.rename_columns("t", {"v": "val"})
    store.alter_column_type("t", {"n": "bigint"})
    store.set_constraint("t", "n_nonneg", "n >= 0")

    rep = store.clone("t", "t2")
    assert rep["files"] == 4
    assert rep["version"] == rep["base"] + 1
    assert (
        glob.glob(str(tmp_path / "t2" / "**" / "*.parquet"), recursive=True)
        == []
    )
    a = store.read("t").orderBy("k").collect()
    b = store.read("t2").orderBy("k").collect()
    assert a == b
    assert store.read("t2").columns == ["k", "val", "n", "lang"]
    assert dict(store.read("t2").dtypes)["n"] == "bigint"
    assert store.constraints("t2") == {"n_nonneg": "n >= 0"}
    # the copied constraint ENFORCES on the clone's own writes
    bad = spark.createDataFrame(
        [(5, 1.0, -3, "xx")], "k bigint, val double, n bigint, lang string"
    )
    with pytest.raises(ValueError, match="constraint"):
        store.merge_in("t2", bad, "k")


def test_clone_independent_evolution(spark, tmp_path):
    """Writes and ALTERs on either side never leak to the other: the
    clone COWs only its own touched files; the source keeps mutating its
    own tree."""
    store = _mk_src(spark, tmp_path)
    store.add_columns("t", {"lang": ("string", "en")})
    store.clone("t", "t2")

    up = spark.createDataFrame(
        [(5, -1.0, 3, "de")], "k bigint, v double, n int, lang string"
    )
    store.merge_in("t2", up, "k")
    store.add_columns("t2", {"extra": "int"})
    store.rename_columns("t2", {"lang": "language"})
    assert store.read("t").where("k = 5").collect()[0]["lang"] == "en"
    assert store.read("t2").where("k = 5").collect()[0]["language"] == "de"
    assert "extra" not in store.read("t").columns

    store.delete_where("t", "n", lo=0, hi=0)
    assert store.read("t").where("n = 0").count() == 0
    assert store.read("t2").where("n = 0").count() > 0

    # time travel + rollback work on the clone's own version chain
    v_first = store.history("t2")[-1]["v"]
    assert store.read("t2", version=v_first).where("k = 5").collect()[0][
        "lang"
    ] == "en"
    store.rollback("t2", v_first)
    assert store.read("t2").columns == ["k", "v", "n", "lang"]
    assert store.read("t2").where("k = 5").collect()[0]["lang"] == "en"


def test_clone_refusals(spark, tmp_path):
    store = _mk_src(spark, tmp_path)
    store.clone("t", "t2")
    with pytest.raises(ValueError, match="itself a shallow clone"):
        store.clone("t2", "t3")
    with pytest.raises(ValueError, match="already exists"):
        store.clone("t", "t2")
    with pytest.raises(ValueError, match="no current version"):
        store.clone("nope", "t4")
    # a compacted clone is physical again and may be cloned
    store.compact("t2")
    store.vacuum("t2", keep_latest=1, stage_ttl_seconds=3600.0)
    # the marker stays (resolution for any retained old versions), so
    # chain-cloning stays refused until the operator makes a fresh table
    with pytest.raises(ValueError, match="itself a shallow clone"):
        store.clone("t2", "t3")


def test_vacuum_refcounts_across_clone(spark, tmp_path):
    """Source vacuum treats live clone references as pinned: referenced
    generations TOMBSTONE (files stay, version leaves history); after
    the clone compacts + vacuums its referencing versions away, the next
    source vacuum reclaims everything. Vacuum on the CLONE never touches
    source files."""
    store = _mk_src(spark, tmp_path)
    store.clone("t", "t2")
    src_files_before = sorted(
        glob.glob(str(tmp_path / "t" / "**" / "*.parquet"), recursive=True)
    )

    # clone-side vacuum: source files untouched
    store.merge_in(
        "t2",
        spark.createDataFrame([(5, -1.0, 3)], "k bigint, v double, n int"),
        "k",
    )
    store.vacuum("t2", keep_latest=1, stage_ttl_seconds=3600.0)
    assert (
        sorted(
            glob.glob(str(tmp_path / "t" / "**" / "*.parquet"), recursive=True)
        )
        == src_files_before
    )

    # source moves on; its old generations are pinned ONLY by the clone
    store.compact("t")
    plan = store.vacuum("t", keep_latest=1, stage_ttl_seconds=3600.0, dry_run=True)
    assert plan["tombstoned"], plan  # the dry run announces the pin
    store.vacuum("t", keep_latest=1, stage_ttl_seconds=3600.0)
    got = store.read("t2").orderBy("k")
    assert got.count() == 1_000
    assert got.where("k = 5").collect()[0]["v"] == -1.0
    # skipping probes read foreign (tombstoned) generations correctly
    hit, _ = store.read_point("t2", "k", 7)
    assert hit.count() == 1
    pdf, _ = store.read_pruned("t2", "n", lo=2, hi=2)
    assert pdf.count() == store.read("t2").where("n = 2").count()

    # clone materializes; the next source vacuum reclaims the tombstones
    store.compact("t2")
    store.vacuum("t2", keep_latest=1, stage_ttl_seconds=3600.0)
    store.vacuum("t", keep_latest=1, stage_ttl_seconds=3600.0)
    vdirs = [
        d
        for d in os.listdir(tmp_path / "t")
        if d.startswith("v") and not d.startswith("v_")
    ]
    assert len(vdirs) == 1, vdirs  # only the compacted current remains
    assert store.read("t2").count() == 1_000


def test_clone_partitioned_source(spark, tmp_path):
    """A Hive-partitioned source clones by reference too; the clone's own
    rewrites land under the recorded spec and partition pruning keeps
    working across the foreign generations."""
    store = _mk_src(spark, tmp_path, partition_by=["n"])
    store.clone("t", "t2")
    assert store.read("t2").orderBy("k").collect() == store.read("t").orderBy(
        "k"
    ).collect()
    up = spark.createDataFrame([(5, -1.0, 3)], "k bigint, v double, n int")
    store.merge_in("t2", up, "k")
    got = store.read("t2")
    # the upsert MOVED k=5 from partition n=5 into n=3 on the clone only
    assert got.where("n = 3").count() == store.read("t").where("n = 3").count() + 1
    assert got.where("n = 5").count() == store.read("t").where("n = 5").count() - 1
    assert got.where("k = 5").collect()[0]["v"] == -1.0
    # rewrite landed under the clone's own dir in the n=3 partition
    own = glob.glob(str(tmp_path / "t2" / "v*" / "n=3" / "*.parquet"))
    assert own, "clone rewrite did not land under the recorded spec"


def test_clone_version_as_of(spark, tmp_path):
    """``clone(src, dst, version=N)`` pins a historical snapshot (Delta
    ``CLONE ... VERSION AS OF``): the clone serves that version's state
    and schema forever, survives the source moving on AND vacuuming
    (refcount tombstones the pinned generations), and a vacuumed pin is
    refused loudly."""
    store = _mk_src(spark, tmp_path)
    v_before = store._read_meta("t")["current"]
    up = spark.createDataFrame([(5, -1.0, 3)], "k bigint, v double, n int")
    store.merge_in("t", up, "k")
    store.add_columns("t", {"note": ("string", "x")})

    store.clone("t", "t_old", version=v_before)
    got = store.read("t_old")
    assert got.columns == ["k", "v", "n"]  # pre-ALTER schema
    assert got.where("k = 5").collect()[0]["v"] == 5.0  # pre-merge value
    assert got.count() == 1_000

    # the source vacuums everything but current; the pin survives by
    # refcount and the clone still reads its snapshot
    store.compact("t")
    store.vacuum("t", keep_latest=1, stage_ttl_seconds=3600.0)
    assert store.read("t_old").where("k = 5").collect()[0]["v"] == 5.0
    # a now-vacuumed version is a loud refusal for NEW clones
    with pytest.raises(ValueError, match="not committed"):
        store.clone("t", "t_old2", version=v_before)


def test_clone_reuses_source_sidecars(spark, tmp_path):
    """The clone's skipping probes must stay O(metadata): its foreign
    references are the same physical bytes the source's versions list,
    so the source's stats records copy forward (zero footer re-reads for
    covered files) and the source's bloom rows copy forward (zero
    O(table) rebuild scans) under the same per-rel soundness checks the
    in-table reuse applies. Without this, the first point lookup or
    merge probe on a fresh clone re-footers and re-hashes the entire
    table (measured 165 s at 60M rows)."""
    store = _mk_src(spark, tmp_path)
    store.collect_file_stats("t", ["k", "n"])
    store.collect_file_blooms("t", ["k"], num_bits=1 << 17, num_hashes=7)
    # a source COW merge: the CURRENT version has no own sidecars (the
    # in-table copy-forward is lazy), so the clone's eager sidecar copy
    # finds nothing and the REUSE path must carry it
    up = spark.createDataFrame([(5, -1.0, 3)], "k bigint, v double, n int")
    store.merge_in("t", up, "k")
    store.clone("t", "t2")
    # only the source merge's own rewrite outputs lack sidecar coverage
    meta2 = store._read_meta("t2")
    entry2 = next(
        e for e in meta2["versions"] if e["v"] == meta2["current"]
    )
    src_cur = store._read_meta("t")["current"]
    uncovered = sum(
        1
        for vp in store._version_filemap("t2", entry2).values()
        if vp == src_cur
    )
    assert uncovered >= 1

    # stats: only the merge's rewrite output needs a footer read
    opens = {"n": 0}
    orig = store.commit.io_open_input

    def counting(path):
        opens["n"] += 1
        return orig(path)

    store.commit.io_open_input = counting
    try:
        stats = store.collect_file_stats("t2", ["k", "n"])
    finally:
        store.commit.io_open_input = orig
    assert len(stats["files"]) >= 5
    assert opens["n"] <= uncovered, (
        f"clone stats re-read {opens['n']} footers for {uncovered} "
        "uncovered files — the source-sidecar reuse is not engaging"
    )

    # blooms: the source's rows copy forward; the point lookup prunes
    store.collect_file_blooms("t2", ["k"], num_bits=1 << 17, num_hashes=7)
    hit, rep = store.read_point("t2", "k", 7)
    assert hit.count() == 1
    assert rep["files_read"] <= 2 < rep["files_total"], rep


def test_clone_randomized_against_model(spark, tmp_path):
    """Randomized interplay: drive source and clone through independent
    op sequences (merges, range deletes, defaulted adds, renames,
    compactions, vacuums on BOTH sides) and assert each table equals its
    own model after every step — the clone seam must never leak either
    way, whatever order maintenance runs in."""
    rng = random.Random(77)
    store = TableStore(spark, str(tmp_path))
    n_rows = 500
    df = spark.range(0, n_rows).selectExpr(
        "id AS k", "CAST(id % 11 AS INT) AS c0"
    )
    store.write("t", df.repartition(4))
    models = {"t": {i: {"c0": i % 11} for i in range(n_rows)}}
    types = {"t": {"c0": "int"}}
    store.merge_in(
        "t",
        spark.createDataFrame([(3, -5)], "k bigint, c0 int"),
        "k",
    )
    models["t"][3] = {"c0": -5}
    store.clone("t", "t2")
    models["t2"] = {k: dict(v) for k, v in models["t"].items()}
    types["t2"] = dict(types["t"])
    next_col = 1
    trace = []
    for _ in range(14):
        tbl = rng.choice(["t", "t2"])
        op = rng.choice(
            ["merge", "merge", "delete_range", "add_default", "rename",
             "compact", "vacuum"]
        )
        cols = sorted(types[tbl])
        if op == "merge":
            keys = rng.sample(range(n_rows + 30), rng.randint(1, 3))
            rows, vals_by_k = [], {}
            for k in keys:
                vals = {
                    c: (
                        rng.randint(-50, 50)
                        if types[tbl][c] == "int"
                        else rng.choice(["aa", "bb"])
                    )
                    for c in cols
                }
                rows.append((k, *[vals[c] for c in cols]))
                vals_by_k[k] = vals
            schema = "k bigint, " + ", ".join(
                f"{c} {types[tbl][c]}" for c in cols
            )
            store.merge_in(tbl, spark.createDataFrame(rows, schema), "k")
            models[tbl].update(vals_by_k)
        elif op == "delete_range":
            ints = [c for c in cols if types[tbl][c] == "int"]
            if not ints:
                continue
            c = rng.choice(ints)
            lo = rng.randint(-20, 20)
            hi = lo + rng.randint(0, 5)
            store.delete_where(tbl, c, lo=lo, hi=hi)
            models[tbl] = {
                k: v
                for k, v in models[tbl].items()
                if v.get(c) is None or not (lo <= v[c] <= hi)
            }
        elif op == "add_default":
            c = f"c{next_col}"
            next_col += 1
            store.add_columns(tbl, {c: ("string", "dd")})
            for v in models[tbl].values():
                v[c] = "dd"
            types[tbl][c] = "string"
        elif op == "rename":
            c = rng.choice(cols)
            c2 = f"c{next_col}"
            next_col += 1
            store.rename_columns(tbl, {c: c2})
            for v in models[tbl].values():
                v[c2] = v.pop(c)
            types[tbl][c2] = types[tbl].pop(c)
        elif op == "compact":
            store.compact(tbl)
        else:
            store.vacuum(tbl, keep_latest=1, stage_ttl_seconds=3600.0)
        trace.append(f"{tbl}:{op}")
        for check_tbl in ("t", "t2"):
            df = store.read(check_tbl)
            cols_now = [c for c in df.columns if c != "k"]
            got = {
                r["k"]: {c: r[c] for c in cols_now} for r in df.collect()
            }
            assert got == models[check_tbl], (
                f"{check_tbl} diverged after {trace}: "
                f"missing {sorted(set(models[check_tbl]) - set(got))[:3]}, "
                f"phantom {sorted(set(got) - set(models[check_tbl]))[:3]}"
            )
