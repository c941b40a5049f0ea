import duckdb, pickle, time
exp = pickle.load(open('/tmp/proto_expected.pkl','rb'))
con = duckdb.connect()
con.execute("create view documents as select * from read_parquet('/root/testdata/sf0.01/documents.parquet')")

M   = "18446744073709551616::HUGEINT"
P   = "1099511628211::HUGEINT"
OFS = "14695981039346656037::HUGEINT"
SIGNED = lambda x: f"(CASE WHEN ({x}) >= 9223372036854775808::HUGEINT THEN ({x}) - {M} ELSE ({x}) END)::BIGINT"

# perm constants (a_i, b_i) — embedded as literal VALUES rows (unsigned)
Mi = 1 << 64
def mix64(z0):
    z = (z0 + 0x9e3779b97f4a7c15) % Mi
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) % Mi
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) % Mi
    return z ^ (z >> 31)
perm_rows = ",".join(f"({i}, {mix64(42+2*i)|1}::HUGEINT, {mix64(42+2*i+1)}::HUGEINT)" for i in range(64))

# a*h mod 2^64 with h split 32/32: (a*(h%2^32) + ((a*(h//2^32)) % 2^32) * 2^32) % 2^64
def mulmod(a, h):
    return (f"(({a} * ({h} % 4294967296::HUGEINT) + "
            f"(({a} * ({h} // 4294967296::HUGEINT)) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {M})")

fnv5 = OFS
for j in range(5):
    fnv5 = f"(xor({fnv5}, unicode(t[i+{j}])::HUGEINT) * {P}) % {M}"

SQL = f"""
WITH docs AS (
  SELECT doc_id AS id, lower(trim(text)) AS t FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS id, lower(trim(substring(text, 1, greatest(length(text) - 20, 1)))) AS t
  FROM documents WHERE doc_id < 50
),
pos AS (SELECT id, t, unnest(range(1, greatest(length(t) - 3, 1))) AS i FROM docs),
shing AS (SELECT DISTINCT id, {fnv5} AS h FROM pos),
perm(pi, a, b) AS (SELECT * FROM (VALUES {perm_rows})),
sigrow AS (
  SELECT s.id, p.pi, min({SIGNED(f"({mulmod('p.a','s.h')} + p.b) % {M}")}) AS sg
  FROM shing s CROSS JOIN perm p
  GROUP BY s.id, p.pi
),
sigs AS (
  SELECT d.id, coalesce(r.sig, (SELECT list(9223372036854775807::BIGINT) FROM range(64))) AS sig
  FROM docs d LEFT JOIN (SELECT id, list(sg ORDER BY pi) AS sig FROM sigrow GROUP BY id) r USING (id)
),
banded AS (
  SELECT id, b, sig[4*b+1:4*b+4] AS key
  FROM sigs, (SELECT unnest(range(0, 16)) AS b)
),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b
  FROM banded x JOIN banded y ON x.b = y.b AND x.key = y.key AND x.id < y.id
),
scored AS (
  SELECT c.id_a, c.id_b,
    len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) / 64.0 AS est
  FROM cand c JOIN sigs sa ON sa.id = c.id_a JOIN sigs sb ON sb.id = c.id_b
)
SELECT id_a, id_b, round(est, 6) AS est_jaccard FROM scored WHERE est >= 0.5
"""
t0=time.time()
got = { (a,b): e for a,b,e in con.execute(SQL).fetchall() }
print("minhash SQL rows:", len(got), "time", round(time.time()-t0,1))
bad = [ (k, got.get(k), exp['mh'].get(k)) for k in set(got)|set(exp['mh']) if abs((got.get(k) or -9) - (exp['mh'].get(k) or -9)) > 1e-12 ]
print("bad:", len(bad), bad[:5])
open('/tmp/minhash_sql.txt','w').write(SQL)
