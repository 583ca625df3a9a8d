#!/usr/bin/env python3
"""Equivalence pin: fast pair-graph + CC oracle vs the slow round-8 forms.

Old forms (round ≤8): all-pairs `wsh a JOIN wsh b` with list_intersect
Jaccard, and a `WITH RECURSIVE reach` transitive closure. New forms
(round 9, in SparkEntry's shared CTEs): unnest → equi-join-on-shingle →
GROUP BY pair (the relational PPJoin), and fixed-round min-label
propagation with pointer jumping.

Both pairs are proven ROW-IDENTICAL here, at every SF. The comparison is
staged through temp tables so the old forms are tractable at sf0.1 (the
recursive CTE re-evaluated the all-pairs join per reference — exactly the
round-8 gate blowout this pin exists to prevent regressing): the shingle
table and each edge set materialize once, then the old closure runs over
the MATERIALIZED edges.

Usage: python3 tools/proto_fast_cc.py [sfDir] [ccRounds]
"""
import sys, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

t0 = time.time()
con.sql("""
CREATE TEMP TABLE wsh AS
WITH wt AS (
  SELECT doc_id, regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS tt,
    regexp_extract_all(text, '\\S+') AS toks
  FROM documents)
SELECT doc_id, list_distinct(
  CASE WHEN len(toks) >= 3
       THEN list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       ELSE [tt] END) AS s
FROM wt""")
print(f"shingles: {time.time()-t0:.1f}s")

# --- edges: old all-pairs vs new unnest/equi-join --------------------
t0 = time.time()
con.sql("""
CREATE TEMP TABLE e_old AS
SELECT a.doc_id AS a, b.doc_id AS b
FROM wsh a JOIN wsh b ON a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
      / nullif(len(list_distinct(list_cat(a.s, b.s))), 0)::DOUBLE, 4) >= 0.6""")
t_old_e = time.time() - t0
t0 = time.time()
con.sql("""
CREATE TEMP TABLE e_new AS
WITH ex AS (SELECT doc_id, len(s) AS ln, unnest(s) AS sh FROM wsh)
SELECT x.doc_id AS a, y.doc_id AS b
FROM ex x JOIN ex y ON x.sh = y.sh AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id, x.ln, y.ln
HAVING round(count(*)::DOUBLE / nullif(x.ln + y.ln - count(*), 0)::DOUBLE, 4) >= 0.6""")
t_new_e = time.time() - t0
n_old = con.sql("SELECT count(*) FROM e_old").fetchone()[0]
n_new = con.sql("SELECT count(*) FROM e_new").fetchone()[0]
diff = con.sql("""SELECT count(*) FROM
  ((SELECT * FROM e_old EXCEPT SELECT * FROM e_new)
   UNION ALL (SELECT * FROM e_new EXCEPT SELECT * FROM e_old))""").fetchone()[0]
print(f"edges old: {t_old_e:.1f}s n={n_old}  new: {t_new_e:.1f}s n={n_new}  "
      + ("EQUAL" if diff == 0 and n_old == n_new else f"MISMATCH ({diff} rows differ)"))

# --- components: recursive closure vs fixed-round min-label ----------
# (both over the SAME materialized edge set — the closure itself is cheap
# once the edges aren't re-derived per recursive reference)
t0 = time.time()
old = con.sql("""
WITH RECURSIVE
und AS (SELECT a, b FROM e_old UNION SELECT b, a FROM e_old),
reach(src, dst) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a)
SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
FROM reach GROUP BY src ORDER BY doc_id""").fetchall()
t_old_c = time.time() - t0

steps = []
prev = "n0"
for i in range(1, rounds + 1):
    steps.append(f"""
r{i} AS MATERIALIZED (
  SELECT p.v, least(p.lbl, min(q.lbl)) AS lbl
  FROM {prev} p JOIN und u ON p.v = u.a JOIN {prev} q ON u.b = q.v
  GROUP BY p.v, p.lbl),
n{i} AS MATERIALIZED (
  SELECT p.v, least(p.lbl, q.lbl) AS lbl
  FROM r{i} p JOIN r{i} q ON p.lbl = q.v)""")
    prev = f"n{i}"
t0 = time.time()
new = con.sql(f"""
WITH und AS MATERIALIZED (SELECT a, b FROM e_new UNION ALL SELECT b, a FROM e_new),
n0 AS MATERIALIZED (SELECT a AS v, least(a, min(b)) AS lbl FROM und GROUP BY a),
{','.join(steps)}
SELECT v AS doc_id, lbl AS canonical_id FROM {prev} ORDER BY doc_id""").fetchall()
t_new_c = time.time() - t0
print(f"comp old(recursive/materialized-edges): {t_old_c:.1f}s rows={len(old)}  "
      f"new(fixed-{rounds}-round): {t_new_c:.1f}s rows={len(new)}  "
      + ("EQUAL" if old == new else "MISMATCH"))
if old != new:
    so, sn = set(old), set(new)
    print("only-old", list(so - sn)[:5])
    print("only-new", list(sn - so)[:5])
    sys.exit(1)
sys.exit(0 if diff == 0 else 1)
