#!/usr/bin/env python3
"""Prototype: fast pair-graph + CC oracle vs the slow recursive one.

Old form: all-pairs wsh a JOIN wsh b (list_intersect Jaccard) +
WITH RECURSIVE reach transitive closure.
New form: unnest -> equi-join on shingle -> GROUP BY pair (relational
PPJoin) + fixed-round min-label propagation with pointer jumping.
Checks exact equality of comp(doc_id, canonical_id) and e(a, b).
"""
import sys, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

SHINGLE = """
wt AS (
  SELECT doc_id, regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS tt, regexp_extract_all(text, '\\S+') AS toks
  FROM documents),
wsh AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [tt] END) AS s
  FROM wt)"""

OLD = f"""WITH RECURSIVE
{SHINGLE},
e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM wsh a JOIN wsh b ON a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE / nullif(len(list_distinct(list_cat(a.s, b.s))), 0)::DOUBLE, 4) >= 0.6),
und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
reach(src, dst) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
  FROM reach GROUP BY src)
SELECT * FROM comp ORDER BY doc_id"""

# fast edges: equi-join on shared shingle, count = |intersect|,
# union = la + lb - c (lists are distinct)
FAST_E = """
ex AS MATERIALIZED (SELECT doc_id, len(s) AS ln, unnest(s) AS sh FROM wsh),
e AS MATERIALIZED (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM ex x JOIN ex y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id, x.ln, y.ln
  HAVING round(count(*)::DOUBLE / nullif(x.ln + y.ln - count(*), 0)::DOUBLE, 4) >= 0.6)"""

def cc_rounds(k):
    ctes = ["""
und AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
n0 AS MATERIALIZED (SELECT a AS v, least(a, min(b)) AS lbl FROM und GROUP BY a)"""]
    prev = "n0"
    for i in range(1, k + 1):
        # edge-relax then pointer-jump, each halves/doubles reach
        ctes.append(f"""
r{i} AS MATERIALIZED (
  SELECT p.v, least(p.lbl, min(q.lbl)) AS lbl
  FROM {prev} p JOIN und u ON p.v = u.a JOIN {prev} q ON u.b = q.v
  GROUP BY p.v, p.lbl),
n{i} AS MATERIALIZED (
  SELECT p.v, least(p.lbl, q.lbl) AS lbl
  FROM r{i} p JOIN r{i} q ON p.lbl = q.v)""")
        prev = f"n{i}"
    return ",".join(ctes) + f""",
comp AS (SELECT v AS doc_id, lbl AS canonical_id FROM {prev})"""

NEW = f"""WITH {SHINGLE},{FAST_E},{cc_rounds(6)}
SELECT * FROM comp ORDER BY doc_id"""

t0 = time.time(); old = con.sql(OLD).fetchall(); t_old = time.time() - t0
t0 = time.time(); new = con.sql(NEW).fetchall(); t_new = time.time() - t0
print(f"old: {t_old:.2f}s rows={len(old)}  new: {t_new:.2f}s rows={len(new)}")
print("comp EQUAL" if old == new else "comp MISMATCH")
if old != new:
    so, sn = set(old), set(new)
    print("only-old", list(so - sn)[:5])
    print("only-new", list(sn - so)[:5])

# edges equality too
OLD_E = f"""WITH {SHINGLE},
e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM wsh a JOIN wsh b ON a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE / nullif(len(list_distinct(list_cat(a.s, b.s))), 0)::DOUBLE, 4) >= 0.6)
SELECT * FROM e ORDER BY a, b"""
NEW_E = f"""WITH {SHINGLE},{FAST_E}
SELECT * FROM e ORDER BY a, b"""
t0 = time.time(); oe = con.sql(OLD_E).fetchall(); t_oe = time.time() - t0
t0 = time.time(); ne = con.sql(NEW_E).fetchall(); t_ne = time.time() - t0
print(f"edges old: {t_oe:.2f}s n={len(oe)}  new: {t_ne:.2f}s n={len(ne)}")
print("edges EQUAL" if oe == ne else "edges MISMATCH")
