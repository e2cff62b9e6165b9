"""Randomized ALTER-sequence model check (round 12).

The per-generation event replay (renames + retires + widenings +
partition-spec changes, interleaved with COW merges/deletes, compaction
and vacuum) has combinatorial surface that example tests cannot cover.
This test drives a TableStore and an in-memory MODEL of the logical
table through the same randomized operation sequences (seeded — fully
deterministic) and asserts the store's read equals the model after
EVERY operation. The model encodes the documented semantics:

- add_columns: existing rows read NULL (or the DEFAULT literal);
- drop_columns: the column vanishes; a later re-add NEVER resurrects
  the dropped values (ADVICE r11 high — the bug class this guards);
- rename_columns: values move to the new name;
- alter_column_type: values identical, type widened;
- alter_partition_spec / compact / vacuum: no logical effect;
- merge_in: upsert by key, batch covers the current schema;
- delete_in: rows with the given keys vanish;
- delete_where: rows with the column in [lo, hi] vanish (NULLs never
  match a range);
- read_pruned / read_point after every step must agree with a plain
  model filter — wrong file skipping under the event stack (retired
  stats, widened bloom hashes, partition-spec moves) is silent data
  loss, the worst failure class here;
- rollback: current re-points to an earlier version — the table
  equals that pin's model exactly (schema included), and history built
  after it keeps time-traveling correctly;
- TIME TRAVEL: a pinned earlier version keeps serving its own
  historical schema and values through its own manifest's event
  history, whatever ALTERs happened after it (vacuumed pins raise the
  documented ValueError, never a wrong result).
"""

from __future__ import annotations

import copy
import random

import pytest
from pyspark.sql import functions as F

from taico_data_integration_spark.ops.incremental import TableStore

N_ROWS = 2_000


def _read_state(store, version=None) -> dict:
    df = store.read("t", version=version)
    cols = df.columns
    return {r["k"]: {c: r[c] for c in cols if c != "k"} for r in df.collect()}


def _assert_state(got: dict, model: dict, label: str) -> None:
    assert set(got) == set(model), (
        f"{label}: keys differ (missing {sorted(set(model) - set(got))[:5]}, "
        f"phantom {sorted(set(got) - set(model))[:5]})"
    )
    for k in model:
        for c, want in model[k].items():
            have = got[k].get(c)
            if isinstance(want, float) and have is not None:
                ok = abs(have - want) < 1e-9
            else:
                ok = have == want
            assert ok, f"{label}: t[{k}].{c} = {have!r}, model says {want!r}"
        assert set(got[k]) == set(model[k]), (
            f"{label}: t[{k}] columns {sorted(got[k])} vs "
            f"model {sorted(model[k])}"
        )


def _run_case(spark, tmp_path, seed: int, n_ops: int = 10) -> None:
    rng = random.Random(seed)
    store = TableStore(spark, str(tmp_path / f"s{seed}"))
    df = spark.range(0, N_ROWS).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS c0", "CAST(id % 7 AS INT) AS c1"
    )
    store.write("t", df.repartition(4))
    store.optimize_layout("t", ["k"], num_files=4)

    # model: key -> {col: value}; plus the current logical column types
    model = {
        i: {"c0": float(i), "c1": i % 7} for i in range(N_ROWS)
    }
    types: dict[str, str] = {"c0": "double", "c1": "int"}
    next_col = 2
    trace: list[str] = []
    # any column EVER placed in a partition spec stays guarded against
    # drop/rename/widen (its values may live in old generations' dir
    # names) — the engine refuses those loudly; the generator respects it
    spec_ever: set[str] = set()

    # (version, frozen model, frozen types) pins for time-travel and
    # rollback checks
    pins: list = []

    def check():
        _assert_state(_read_state(store), model, f"seed {seed} after {trace}")
        pins.append(
            (
                store._read_meta("t")["current"],
                copy.deepcopy(model),
                dict(types),
            )
        )
        # skipping probes: a pruned range read and a point lookup must
        # agree with a plain model filter — stats/bloom mistakes under
        # the event stack silently LOSE rows
        num_cols = [c for c in sorted(types) if types[c] in ("int", "bigint", "double", "float")]
        if num_cols:
            c = rng.choice(num_cols)
            lo = rng.randint(-50, 50)
            hi = lo + rng.randint(0, 30)
            pdf, _rep = store.read_pruned("t", c, lo=lo, hi=hi)
            got_keys = {r["k"] for r in pdf.select("k").collect()}
            want_keys = {
                k for k, vals in model.items()
                if vals.get(c) is not None and lo <= vals[c] <= hi
            }
            assert got_keys == want_keys, (
                f"seed {seed} read_pruned({c},[{lo},{hi}]) after {trace}: "
                f"missing {sorted(want_keys - got_keys)[:5]}, "
                f"phantom {sorted(got_keys - want_keys)[:5]}"
            )
        probe_k = rng.randint(0, N_ROWS + 50)
        hit, _prep = store.read_point("t", "k", probe_k)
        assert hit.count() == (1 if probe_k in model else 0), (
            f"seed {seed} read_point(k={probe_k}) after {trace}"
        )
        # a random earlier pin must still serve ITS schema and values —
        # or raise the documented vacuumed-version ValueError, never a
        # silent wrong result
        if len(pins) > 1:
            v_old, m_old, _t_old = rng.choice(pins[:-1])
            try:
                old = _read_state(store, version=v_old)
            except ValueError:
                pins[:] = [p for p in pins if p[0] != v_old]  # vacuumed
            else:
                _assert_state(
                    old, m_old,
                    f"seed {seed} time-travel v{v_old} after {trace}",
                )

    for _i in range(n_ops):
        op = rng.choice(
            ["merge", "merge", "delete", "delete_range", "add",
             "add_default", "drop", "rename", "widen", "spec", "compact",
             "vacuum", "rollback", "zorder"]
        )
        cols = sorted(types)
        if op == "merge":
            keys = rng.sample(range(N_ROWS + 50), rng.randint(1, 4))
            rows = []
            for k in keys:
                vals = {}
                for c in cols:
                    t = types[c]
                    if t in ("int", "bigint"):
                        vals[c] = rng.randint(-100, 100)
                    elif t in ("float", "double"):
                        vals[c] = float(rng.randint(-100, 100))
                    else:
                        vals[c] = rng.choice(["aa", "bb", None])
                rows.append((k, *[vals[c] for c in cols]))
                model[k] = vals
            schema = "k bigint, " + ", ".join(f"{c} {types[c]}" for c in cols)
            store.merge_in("t", spark.createDataFrame(rows, schema), "k")
            trace.append(f"merge{keys}")
        elif op == "delete":
            live = sorted(model)
            if not live:
                continue
            doomed = rng.sample(live, min(2, len(live)))
            store.delete_in("t", "k", doomed)
            for k in doomed:
                model.pop(k)
            trace.append(f"delete{doomed}")
        elif op == "delete_range":
            cands = [c for c in cols if types[c] in ("int", "bigint", "double", "float")]
            if not cands:
                continue
            c = rng.choice(cands)
            lo = rng.randint(-50, 50)
            hi = lo + rng.randint(0, 10)
            if types[c] in ("double", "float"):
                lo, hi = float(lo), float(hi)
            store.delete_where("t", c, lo=lo, hi=hi)
            for k in [
                k for k, vals in model.items()
                if vals.get(c) is not None and lo <= vals[c] <= hi
            ]:
                model.pop(k)
            trace.append(f"delete_where:{c}[{lo},{hi}]")
        elif op in ("add", "add_default"):
            c = f"c{next_col}"
            next_col += 1
            t = rng.choice(["int", "double", "string"])
            if op == "add_default":
                dv = {"int": 5, "double": 2.5, "string": "dd"}[t]
                store.add_columns("t", {c: (t, dv)})
                for k in model:
                    model[k][c] = dv
            else:
                store.add_columns("t", {c: t})
                for k in model:
                    model[k][c] = None
            types[c] = t
            trace.append(f"{op}:{c}:{t}")
        elif op == "drop":
            victims = [c for c in cols if c not in spec_ever]
            if not victims or len(cols) <= 1:
                continue
            c = rng.choice(victims)
            store.drop_columns("t", [c])
            for k in model:
                model[k].pop(c, None)
            types.pop(c)
            trace.append(f"drop:{c}")
        elif op == "rename":
            cands = [c for c in cols if c not in spec_ever]
            if not cands:
                continue
            c = rng.choice(cands)
            c2 = f"c{next_col}"
            next_col += 1
            store.rename_columns("t", {c: c2})
            for k in model:
                model[k][c2] = model[k].pop(c)
            types[c2] = types.pop(c)
            trace.append(f"rename:{c}->{c2}")
        elif op == "widen":
            cands = [
                c for c in cols
                if types[c] in ("int", "float") and c not in spec_ever
            ]
            if not cands:
                continue
            c = rng.choice(cands)
            t2 = {"int": "bigint", "float": "double"}[types[c]]
            store.alter_column_type("t", {c: t2})
            types[c] = t2
            trace.append(f"widen:{c}->{t2}")
        elif op == "spec":
            cands = [c for c in cols if types[c] in ("int", "string")]
            new_spec = [rng.choice(cands)] if cands and rng.random() < 0.7 else []
            try:
                store.alter_partition_spec("t", new_spec)
                spec_ever.update(new_spec)
                trace.append(f"spec:{new_spec}")
            except ValueError:
                continue  # same spec / all-columns guard
        elif op == "rollback":
            if len(pins) < 2:
                continue
            v_old, m_old, t_old = rng.choice(pins[:-1])
            try:
                store.rollback("t", v_old)
            except ValueError:
                # the pin was vacuumed away — a loud refusal, drop it
                pins[:] = [p for p in pins if p[0] != v_old]
                continue
            model = copy.deepcopy(m_old)
            types = dict(t_old)
            trace.append(f"rollback:v{v_old}")
        elif op == "zorder":
            # full-rewrite path distinct from compact: range-partition +
            # in-file sort, recorded-spec-preserving; like compact it must
            # have zero logical effect whatever the event stack says
            zc = [
                c for c in cols
                if types[c] in ("int", "bigint", "double", "float")
            ]
            zcols = ["k"] + (
                [rng.choice(zc)] if zc and rng.random() < 0.5 else []
            )
            store.optimize_layout("t", zcols, num_files=4)
            trace.append(f"zorder:{zcols}")
        elif op == "compact":
            store.compact("t")
            trace.append("compact")
        else:
            store.vacuum("t", keep_latest=2, stage_ttl_seconds=3600.0)
            trace.append("vacuum")
        check()


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_randomized_alter_sequences_match_model(spark, tmp_path, seed):
    _run_case(spark, tmp_path, seed)
