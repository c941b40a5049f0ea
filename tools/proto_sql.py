"""DuckDB SQL formulations of fingerprint/simhash/minhash; compare to the
Python-replica expected values."""
import duckdb, pickle, textwrap

exp = pickle.load(open('/tmp/proto_expected.pkl','rb'))
con = duckdb.connect()
con.execute("create view documents as select * from read_parquet('/root/testdata/sf0.01/documents.parquet')")

M   = "18446744073709551616::HUGEINT"
P   = "1099511628211::HUGEINT"
OFS = "14695981039346656037::HUGEINT"
SIGNED = lambda x: f"(CASE WHEN ({x}) >= 9223372036854775808::HUGEINT THEN ({x}) - {M} ELSE ({x}) END)::BIGINT"

# ---------------- fingerprint: FNV-1a over lower(trim(text)) -----------------
FP = f"""
SELECT doc_id, {SIGNED(f'''list_reduce(
  list_prepend({OFS}, list_transform(range(1, length(lower(trim(text)))+1),
                                     i -> unicode(lower(trim(text))[i])::HUGEINT)),
  (h, c) -> (xor(h, c) * {P}) % {M})''')} AS fp
FROM documents
"""
got = dict(con.execute(FP).fetchall())
assert got == exp['fp'], [ (k, got[k], exp['fp'][k]) for k in list(got)[:3] ]
print("fingerprint SQL OK", len(got))

# ---------------- simhash -----------------
# tokens -> fnv per token -> 64 bit votes -> signed signature
SH = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
th AS (
  SELECT doc_id, list_reduce(
    list_prepend({OFS}, list_transform(range(1, length(tok)+1), i -> unicode(tok[i])::HUGEINT)),
    (h, c) -> (xor(h, c) * {P}) % {M}) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, b, sum(CASE WHEN (h // (2::HUGEINT ^ b)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th, (SELECT unnest(range(0, 64)) AS b)
  GROUP BY doc_id, b
),
sig AS (
  SELECT doc_id, sum(CASE WHEN acc > 0 THEN (2::HUGEINT ^ b)::HUGEINT ELSE 0::HUGEINT END) AS u
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, coalesce({SIGNED('s.u')}, 0) AS simhash
FROM documents d LEFT JOIN sig s USING (doc_id)
"""
try:
    got = dict(con.execute(SH).fetchall())
    bad = [(k, got[k], exp['sh'][k]) for k in got if got[k] != exp['sh'][k]]
    print("simhash SQL:", len(got), "bad:", len(bad), bad[:3])
except Exception as e:
    print("simhash FAIL:", e)
