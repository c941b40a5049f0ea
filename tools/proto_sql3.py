import duckdb, pickle, time
exp = pickle.load(open('/tmp/proto_expected.pkl','rb'))
con = duckdb.connect()
con.execute("create view documents as select * from read_parquet('/root/testdata/sf0.01/documents.parquet')")
base = open('/tmp/minhash_sql.txt').read()
# reuse everything up to 'scored'; replace final select with jaccard verify
head = base[:base.index("scored AS")]
SQL = head + """
shstr AS (
  SELECT id, list_distinct([substr(t, i, 5) for i in range(1, greatest(length(t) - 3, 1))]) AS sh
  FROM docs
)
SELECT c.id_a, c.id_b,
  CASE WHEN len(x.sh) = 0 AND len(y.sh) = 0 THEN 1.0
       ELSE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(list_distinct(x.sh || y.sh)) END AS jaccard
FROM cand c JOIN shstr x ON x.id = c.id_a JOIN shstr y ON y.id = c.id_b
WHERE CASE WHEN len(x.sh) = 0 AND len(y.sh) = 0 THEN 1.0
       ELSE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(list_distinct(x.sh || y.sh)) END >= 0.3
"""
t0=time.time()
got = { (a,b): j for a,b,j in con.execute(SQL).fetchall() }
print("rows:", len(got), "time", round(time.time()-t0,1))
bad = [ (k, got.get(k), exp['nj'].get(k)) for k in set(got)|set(exp['nj'])
        if got.get(k) is None or exp['nj'].get(k) is None or abs(got[k]-exp['nj'][k]) > 1e-9 ]
print("bad:", len(bad), bad[:5])

# simhash pairs over union docs: brute force hamming <= 7
SH = """
WITH docs AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS id, substring(text, 1, greatest(length(text) - 20, 1)) AS text
  FROM documents WHERE doc_id < 50
),
toks AS (
  SELECT id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM docs WHERE length(trim(text)) > 0
),
th AS (
  SELECT id, list_reduce(
    list_prepend(14695981039346656037::HUGEINT, list_transform(range(1, length(tok)+1), i -> unicode(tok[i])::HUGEINT)),
    (h, c) -> (xor(h, c) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS h
  FROM toks
),
bits AS (
  SELECT id, b, sum(CASE WHEN (h // (2::HUGEINT ^ b)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th, (SELECT unnest(range(0, 64)) AS b) GROUP BY id, b
),
sig AS (
  SELECT d.id, coalesce((SELECT (CASE WHEN s.u >= 9223372036854775808::HUGEINT THEN s.u - 18446744073709551616::HUGEINT ELSE s.u END)::BIGINT
    FROM (SELECT sum(CASE WHEN acc > 0 THEN (2::HUGEINT ^ b)::HUGEINT ELSE 0::HUGEINT END) AS u FROM bits WHERE bits.id = d.id) s), 0) AS simhash
  FROM docs d
)
SELECT a.id AS id_a, b.id AS id_b, CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 7
"""
t0=time.time()
got2 = { (a,b): h for a,b,h in con.execute(SH).fetchall() }
print("simhash pairs rows:", len(got2), "time", round(time.time()-t0,1))
bad2 = [ (k, got2.get(k), exp['sp'].get(k)) for k in set(got2)|set(exp['sp']) if got2.get(k) != exp['sp'].get(k) ]
print("bad:", len(bad2), bad2[:5])
