#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs DuckDB over the same parquet tables with SparkEntry.oracleSql (dumped by
graft.Verify as oracle_sql.json) and compares against the parquet results
Verify wrote — values stringified, columns sorted by name, rows sorted.

Additionally mirrors the DRIVER's comparison path, which is pandas-based and
dtype/repr-sensitive: both sides are materialized as pandas frames and their
dtypes compared column-by-column (DuckDB HUGEINT -> float64 vs Spark int64
was the class of bug behind 10 round-4 hash mismatches), and array-typed
output columns are rejected outright (pandas sort_values crashes on ndarray
cells — the round-4 q104 harness crash).
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, os, sys, glob, math, time

import duckdb
import pandas as pd

# Hard wall budget for the DuckDB leg (seconds). The driver's gate has a
# finite budget; round 8 shipped an empty CORRECTNESS artifact because
# eleven pair-graph oracles silently cost 47-72 s EACH. Fail the preflight
# loudly if the oracle side exceeds this, so surface growth can never
# zero a round again.
DUCK_BUDGET_S = float(os.environ.get("GRAFT_DUCK_BUDGET_S", "480"))
SLOW_QUERY_S = 5.0


def dtype_preflight(name, spark_df, duck_df):
    """Return a list of driver-compat problems (empty = clean)."""
    problems = []
    for df, side in ((spark_df, "spark"), (duck_df, "duck")):
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                    lambda v: isinstance(v, (list, tuple)) or
                    type(v).__name__ == "ndarray").any():
                problems.append(
                    f"{side}.{c} is array-typed (driver pandas sorter crashes)")
    def eff(df, c):
        d = str(df[c].dtype)
        # Spark parquet DATE loads as object-of-datetime.date; the driver
        # canonicalizes that against DuckDB's datetime64 (q106 et al. were
        # hash-green in round 4), so normalize both to "date" here.
        if d.startswith("datetime64"):
            return "date"
        import datetime
        if d == "object" and len(df) and df[c].map(
                lambda v: v is None or isinstance(v, datetime.date)).all():
            return "date"
        return d
    sd = {c: eff(spark_df, c) for c in spark_df.columns}
    dd = {c: eff(duck_df, c) for c in duck_df.columns}
    for c in sorted(set(sd) & set(dd)):
        if sd[c] != dd[c]:
            problems.append(f"dtype[{c}]: spark={sd[c]} duck={dd[c]}")
    return problems


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def table_canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [names[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    duck_total = 0.0
    slow = []
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written")
            failures += 1
            continue
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_names, got = table_canon(got_rel.fetchall(), got_rel.columns)
        t0 = time.time()
        try:
            want_rel = con.sql(oracle[name])
            want_names, want = table_canon(want_rel.fetchall(), want_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        duck_total += dt
        if dt >= SLOW_QUERY_S:
            slow.append((name, dt))
        if got_names != want_names:
            print(f"FAIL {name}: columns {got_names} vs oracle {want_names}")
            failures += 1
        elif got != want:
            print(f"FAIL {name}: {len(got)} rows vs oracle {len(want)}")
            diff = [(a, b) for a, b in zip(got, want) if a != b]
            for a, b in diff[:5]:
                print(f"   spark {a}\n   duck  {b}")
            if len(got) != len(want):
                sg, sw = set(got), set(want)
                for r in list(sg - sw)[:3]:
                    print(f"   only-spark {r}")
                for r in list(sw - sg)[:3]:
                    print(f"   only-duck  {r}")
            failures += 1
        else:
            probs = dtype_preflight(name, pd.read_parquet(f"{out_dir}/{name}"),
                                    want_rel.df())
            if probs:
                print(f"FAIL {name}: values match but driver-dtype preflight red:")
                for p in probs:
                    print(f"   {p}")
                failures += 1
            else:
                print(f"ok   {name}: {len(got)} rows ({dt:.2f}s duck)")
    # rows-only queries (no oracle): just report row counts
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"rows {name}: {n}")
    print(f"DUCK TOTAL: {duck_total:.1f}s (budget {DUCK_BUDGET_S:.0f}s)")
    for name, dt in sorted(slow, key=lambda x: -x[1]):
        print(f"SLOW {name}: {dt:.1f}s oracle")
    if duck_total > DUCK_BUDGET_S:
        print(f"FAIL <budget>: DuckDB leg {duck_total:.1f}s exceeds "
              f"{DUCK_BUDGET_S:.0f}s — the driver gate will starve; "
              f"rewrite the SLOW oracles above")
        failures += 1
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
