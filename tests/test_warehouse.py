"""Planted-case tests for the warehouse lifecycle ops (SCD2 / CDC /
time-series resample)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from taico_data_integration_spark.ops.cdc import cdc_apply, cdc_collapse
from taico_data_integration_spark.ops.scd import scd2_apply, scd2_as_of, scd2_init
from taico_data_integration_spark.ops.timeseries import resample_ffill


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


class TestScd2:
    def _dim(self, spark):
        s1 = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["id", "attr"]
        )
        return scd2_init(s1, ["id"], ["attr"], "2020-01-01")

    def test_init_all_current(self, spark):
        dim = self._dim(spark)
        assert dim.where(F.col("is_current")).count() == 3
        assert dim.where(F.col("valid_to").isNotNull()).count() == 0

    def test_apply_change_delete_insert_keep(self, spark):
        dim = self._dim(spark)
        # id=1 unchanged, id=2 changed, id=3 deleted, id=4 new
        snap = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], ["id", "attr"])
        out = scd2_apply(dim, snap, ["id"], ["attr"], "2021-06-01")
        t1 = datetime.date(2021, 6, 1)
        got = _rows(out.select("id", "attr", "valid_to", "is_current"), "id", "valid_from")
        assert got == [
            (1, "a", None, True),
            (2, "b", t1, False),
            (2, "B", None, True),
            (3, "c", t1, False),
            (4, "d", None, True),
        ]

    def test_apply_is_idempotent_on_same_snapshot(self, spark):
        dim = self._dim(spark)
        snap = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], ["id", "attr"])
        once = scd2_apply(dim, snap, ["id"], ["attr"], "2021-06-01")
        twice = scd2_apply(once, snap, ["id"], ["attr"], "2022-01-01")
        # current slice identical; only closed id=3 row stays closed
        cur = _rows(twice.where("is_current").select("id", "attr"), "id")
        assert cur == [(1, "a"), (2, "B"), (4, "d")]
        assert twice.count() == once.count()

    def test_null_safe_attr_compare(self, spark):
        s1 = spark.createDataFrame([(1, None), (2, "x")], "id long, attr string")
        dim = scd2_init(s1, ["id"], ["attr"], "2020-01-01")
        snap = spark.createDataFrame([(1, None), (2, None)], "id long, attr string")
        out = scd2_apply(dim, snap, ["id"], ["attr"], "2021-01-01")
        # null == null is "unchanged"; x -> null is a change
        assert out.where("id = 1").count() == 1
        assert out.where("id = 2").count() == 2

    def test_as_of_slice(self, spark):
        dim = self._dim(spark)
        snap = spark.createDataFrame([(1, "a"), (2, "B")], ["id", "attr"])
        out = scd2_apply(dim, snap, ["id"], ["attr"], "2021-06-01")
        before = _rows(scd2_as_of(out, "2020-12-31").select("id", "attr"), "id")
        after = _rows(scd2_as_of(out, "2021-06-01").select("id", "attr"), "id")
        assert before == [(1, "a"), (2, "b"), (3, "c")]
        assert after == [(1, "a"), (2, "B")]

    def test_null_keyed_rows_routed_not_dropped(self, spark):
        """A NULL natural key joins nothing; presence markers must route it
        to closed (current side) / opened (snapshot side), never drop it."""
        s1 = spark.createDataFrame([(None, "a"), (2, "x")], "id long, attr string")
        dim = scd2_init(s1, ["id"], ["attr"], "2020-01-01")
        snap = spark.createDataFrame([(None, "b"), (2, "x")], "id long, attr string")
        out = scd2_apply(dim, snap, ["id"], ["attr"], "2021-01-01")
        null_rows = _rows(
            out.where(F.col("id").isNull()).select("attr", "is_current"), "attr"
        )
        # old NULL-keyed row closed, new NULL-keyed row opened
        assert null_rows == [("a", False), ("b", True)]
        assert out.count() == 3


class TestCdc:
    def _log(self, spark):
        return spark.createDataFrame(
            [
                (1, "I", 1, 10.0),
                (1, "U", 2, 11.0),
                (2, "I", 1, 20.0),
                (2, "D", 2, None),
                (3, "I", 1, 30.0),
                (4, "D", 1, None),  # delete of a base-only key
            ],
            "id long, op string, seq long, val double",
        )

    def test_collapse_latest_wins_and_drops_deletes(self, spark):
        got = _rows(cdc_collapse(self._log(spark), ["id"]).select("id", "val"), "id")
        assert got == [(1, 11.0), (3, 30.0)]

    def test_apply_onto_base(self, spark):
        base = spark.createDataFrame(
            [(2, 99.0), (4, 40.0), (5, 50.0)], "id long, val double"
        )
        got = _rows(cdc_apply(base, self._log(spark), ["id"]).select("id", "val"), "id")
        # 1 upserted, 2 deleted (base row too), 3 inserted, 4 deleted, 5 untouched
        assert got == [(1, 11.0), (3, 30.0), (5, 50.0)]


class TestScd2Invariants:
    """Structural invariants any SCD2 dimension must satisfy, checked on the
    real fixture query (sf0.001)."""

    def test_fixture_dim_invariants(self, spark):
        from taico_data_integration_spark.queries.warehouse import scd2_customer_orders

        dim = scd2_customer_orders(spark, "/root/testdata/sf0.001").cache()
        try:
            per_key = dim.groupBy("c_custkey").agg(
                F.sum(F.col("is_current").cast("int")).alias("n_cur"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            # exactly one current version per key
            assert per_key.where("n_cur <> 1").count() == 0
            # closed rows have valid_to after valid_from; current rows have none
            assert dim.where("is_current AND valid_to IS NOT NULL").count() == 0
            assert dim.where("NOT is_current AND valid_to <= valid_from").count() == 0
        finally:
            dim.unpersist()


class TestScd2RandomReplay:
    """Seeded random snapshot-sequence replay through ``scd2_apply``, checked
    after EVERY apply against an independent pure-Python SCD2 model.

    The decisive oracle: for every apply date d_j, ``scd2_as_of(dim, d_j)``
    must reconstruct snapshot_j EXACTLY, forever — history is an append-only
    log of the snapshots it absorbed. Also pins the documented NULL-key
    behavior (a NULL natural key joins nothing, so its current row is closed
    and reopened on every apply) and the structural invariants (one current
    row per live key, non-overlapping validity windows).
    """

    SCHEMA = "id bigint, a string, b string, valid_from date, valid_to date, is_current boolean"

    @pytest.mark.parametrize("seed", [7, 19, 31])
    def test_replay_matches_python_model(self, spark, seed):
        import random

        rng = random.Random(seed)
        d0 = datetime.date(2020, 1, 1)
        dates = [d0 + datetime.timedelta(days=17 * (i + 1)) for i in range(6)]

        def rand_snapshot():
            ids = rng.sample(range(8), rng.randint(0, 5))
            rows = [(i, rng.choice("pqr"), rng.choice([None, "x", "y"])) for i in ids]
            if rng.random() < 0.4:  # at most one NULL-keyed row per snapshot
                rows.append((None, rng.choice("pqr"), "n"))
            return rows

        # --- independent Python model: list of [id, a, b, from, to, current]
        model: list[list] = []

        def model_apply(snap_rows, ts):
            snap = {r[0]: (r[1], r[2]) for r in snap_rows if r[0] is not None}
            null_rows = [r for r in snap_rows if r[0] is None]
            for row in model:
                if not row[5]:
                    continue
                key = row[0]
                # NULL keys never join; absent / changed keys are closed
                if key is None or key not in snap or snap[key] != (row[1], row[2]):
                    row[4], row[5] = ts, False
            live = {
                r[0]: (r[1], r[2]) for r in model if r[5] and r[0] is not None
            }
            for key, attrs in snap.items():
                if live.get(key) != attrs:
                    model.append([key, attrs[0], attrs[1], ts, None, True])
            for r in null_rows:
                model.append([None, r[1], r[2], ts, None, True])

        def model_as_of(d):
            return {
                (r[0], r[1], r[2])
                for r in model
                if r[3] <= d and (r[4] is None or r[4] > d)
            }

        snap0 = rand_snapshot()
        model_apply(snap0, d0)
        dim = scd2_init(
            spark.createDataFrame(snap0, "id bigint, a string, b string"),
            ["id"], ["a", "b"], str(d0),
        )
        snapshots = {d0: snap0}
        for i, d in enumerate(dates):
            snap = rand_snapshot()
            snapshots[d] = snap
            dim = scd2_apply(
                dim,
                spark.createDataFrame(snap, "id bigint, a string, b string"),
                ["id"], ["a", "b"], str(d),
            )
            model_apply(snap, d)
            rows = [tuple(r) for r in dim.collect()]
            ctx = f"seed={seed} step={i} date={d}"
            # 1) full history multiset parity with the model
            assert sorted(rows, key=repr) == sorted(
                (tuple(r) for r in model), key=repr
            ), ctx
            # 2) as-of reconstructs EVERY absorbed snapshot exactly
            for dj, sj in snapshots.items():
                got = {
                    (r.id, r.a, r.b)
                    for r in scd2_as_of(dim, str(dj)).select("id", "a", "b").collect()
                }
                assert got == {(r[0], r[1], r[2]) for r in sj}, f"{ctx} as_of({dj})"
            # 3) structural invariants on the raw rows
            by_key: dict = {}
            for kid, a, b, vf, vt, cur in rows:
                by_key.setdefault(kid, []).append((vf, vt, cur))
                assert vt is None or vt > vf, ctx
            for kid, spans in by_key.items():
                assert sum(1 for s in spans if s[2]) <= 1, f"{ctx} key={kid}"
                if kid is None:
                    continue  # NULL keys legitimately reopen each apply
                closed = sorted(s[:2] for s in spans if not s[2])
                for (f1, t1), (f2, _) in zip(closed, closed[1:]):
                    assert t1 <= f2, f"{ctx} key={kid} overlapping windows"
            # keep plan depth bounded across applies: apply() is a pure
            # function of the row set, so rebuilding from rows is semantics-
            # preserving while avoiding a 7-deep full-outer-join lineage
            dim = spark.createDataFrame(rows, self.SCHEMA)


class TestCdcInvariants:
    def test_collapse_is_idempotent(self, spark):
        """Re-collapsing a collapsed changelog (as seq=1 inserts) is a no-op."""
        log = spark.createDataFrame(
            [(1, "I", 1, 10.0), (1, "U", 2, 11.0), (2, "I", 1, 20.0), (2, "D", 2, None)],
            "id long, op string, seq long, val double",
        )
        once = cdc_collapse(log, ["id"])
        again = cdc_collapse(once, ["id"])
        assert sorted(tuple(r) for r in once.collect()) == sorted(
            tuple(r) for r in again.collect()
        )


class TestGoldenRecord:
    def test_latest_fields_and_lifetime_aggs(self, spark):
        from taico_data_integration_spark.ops.survivorship import golden_record

        ts = datetime.datetime
        df = spark.createDataFrame(
            [
                (1, 10, ts(2024, 1, 1), "a", 2.0),
                (1, 11, ts(2024, 1, 3), "b", 4.0),
                (1, 12, ts(2024, 1, 3), "c", 6.0),  # ts tie -> id 12 wins
                (2, 20, ts(2024, 1, 2), "z", 1.0),
            ],
            "k long, id long, ts timestamp, f string, v double",
        )
        out = golden_record(
            df,
            keys=["k"],
            order_by=[F.col("ts").desc(), F.col("id").desc()],
            latest_fields=["f"],
            lifetime_aggs={"n": F.count(F.lit(1)), "total": F.sum("v")},
        )
        got = _rows(out.select("k", "f", "n", "total"), "k")
        assert got == [(1, "c", 3, 12.0), (2, "z", 1, 1.0)]


    @pytest.mark.parametrize("seed", [5, 23])
    def test_golden_record_fuzz_matches_model(self, spark, seed):
        """Random multi-feed records per key against a pure-Python model:
        latest fields from the unique max-seq row, lifetime aggregates over
        the whole key — including single-record keys and duplicate values."""
        import random

        from taico_data_integration_spark.ops.survivorship import golden_record

        rng = random.Random(seed)
        rows = [
            (rng.randint(1, 8), seq, rng.choice("abcdef"), float(rng.randint(-50, 50)))
            for seq in range(rng.randint(5, 120))
        ]
        model: dict[int, dict] = {}
        for k, seq, name, score in rows:
            m = model.setdefault(k, {"seq": -1, "name": None, "n": 0, "total": 0.0, "mx": None})
            m["n"] += 1
            m["total"] += score
            m["mx"] = score if m["mx"] is None else max(m["mx"], score)
            if seq > m["seq"]:
                m["seq"], m["name"] = seq, name
        df = spark.createDataFrame(rows, "k long, seq long, name string, score double")
        out = golden_record(
            df,
            keys=["k"],
            order_by=[F.col("seq").desc()],
            latest_fields=["name"],
            lifetime_aggs={
                "n": F.count(F.lit(1)),
                "total": F.sum("score"),
                "mx": F.max("score"),
            },
        )
        got = {r.k: (r.name, r.n, r.total, r.mx) for r in out.collect()}
        assert got == {k: (m["name"], m["n"], m["total"], m["mx"]) for k, m in model.items()}


class TestBandJoin:
    def test_matches_naive_theta_join(self, spark):
        from taico_data_integration_spark.ops.joins import band_join

        left = spark.createDataFrame(
            [(1, "g1", 0.0), (2, "g1", 9.9), (3, "g1", 10.1), (4, "g2", 10.0), (5, "g1", -10.0)],
            "id long, g string, v double",
        )
        got = band_join(left, left, "v", eps=10.0, extra_keys=["g"])
        got_pairs = sorted(
            (r.id_l, r.id_r) for r in got.where("id_l < id_r").collect()
        )
        naive = sorted(
            (a, c)
            for a, ga, va in left.collect()
            for c, gc, vc in left.collect()
            if a < c and ga == gc and abs(va - vc) <= 10.0
        )
        assert got_pairs == naive
        # cross-group / out-of-band pairs excluded: (1,4) diff groups,
        # (3,5) out of band; boundary pair (1,4) would be in-band if same group
        assert (1, 4) not in got_pairs and (3, 5) not in got_pairs
        assert (1, 2) in got_pairs and (2, 3) in got_pairs


class TestResampleFfill:
    def test_gaps_filled_per_key(self, spark):
        ts = datetime.datetime
        df = spark.createDataFrame(
            [
                (1, ts(2024, 1, 1, 5), 1.0),
                (1, ts(2024, 1, 1, 9), 3.0),   # same day: max -> 3.0
                (1, ts(2024, 1, 4, 1), 7.0),   # gap: Jan 2-3 filled with 3.0
                (2, ts(2024, 1, 2, 0), 5.0),   # single-day key: no gap rows
            ],
            "user_id long, ts timestamp, value double",
        )
        got = _rows(
            resample_ffill(df, "user_id", "ts", "value"), "user_id", "day"
        )
        d = datetime.date
        assert got == [
            (1, d(2024, 1, 1), True, 3.0),
            (1, d(2024, 1, 2), False, 3.0),
            (1, d(2024, 1, 3), False, 3.0),
            (1, d(2024, 1, 4), True, 7.0),
            (2, d(2024, 1, 2), True, 5.0),
        ]

    @pytest.mark.parametrize("seed", [7, 31])
    def test_resample_ffill_fuzz_matches_pandas(self, spark, seed):
        """Random sparse series against pandas' own resample machinery:
        per key, daily max reindexed over [first, last] day and ffilled.
        Stresses same-day collisions, multi-week gaps, and single-day keys."""
        import random

        import pandas as pd

        rng = random.Random(seed)
        base = datetime.datetime(2024, 3, 1)
        rows = [
            (
                rng.randint(1, 6),
                base + datetime.timedelta(minutes=rng.randint(0, 60 * 24 * 45)),
                float(rng.randint(-30, 30)),
            )
            for _ in range(rng.randint(5, 150))
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        got = {
            (r.user_id, r.day): (r.observed, r.value_filled)
            for r in resample_ffill(df, "user_id", "ts", "value").collect()
        }
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        pdf["day"] = pdf.ts.dt.normalize()
        expected = {}
        for uid, grp in pdf.groupby("user_id"):
            daily = grp.groupby("day").value.max()
            dense = daily.reindex(pd.date_range(daily.index.min(), daily.index.max()))
            filled = dense.ffill()
            for day, v in filled.items():
                expected[(uid, day.date())] = (not pd.isna(dense[day]), v)
        assert got == expected


def test_largest_remainder_allocation_sums_exactly(spark):
    """The defining invariant: per-order allocations sum EXACTLY to the
    rebate, and each line's allocation differs from exact proportionality
    by less than one cent."""
    from taico_data_integration_spark.queries.warehouse import largest_remainder_allocation

    rows = largest_remainder_allocation(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    by_order: dict = {}
    for r in rows:
        tot, rebate = by_order.get(r.l_orderkey, (0, r.rebate))
        by_order[r.l_orderkey] = (tot + r.alloc_cents, r.rebate)
    for okey, (alloc_sum, rebate) in by_order.items():
        assert alloc_sum == rebate, okey
