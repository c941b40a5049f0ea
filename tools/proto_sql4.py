import duckdb, math, time
# Acklam normPpf replica (central branch for p=0.975)
def norm_ppf(p):
    a=[-3.969683028665376e+01,2.209460984245205e+02,-2.759285104469687e+02,1.383577518672690e+02,-3.066479806614716e+01,2.506628277459239e+00]
    b=[-5.447609879822406e+01,1.615858368580409e+02,-1.556989798598866e+02,6.680131188771972e+01,-1.328068155288572e+01]
    q=p-0.5; r=q*q
    return (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*q/(((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)
z = norm_ppf(1-0.05/2)
print("z =", repr(z))

con = duckdb.connect()
con.execute("create view documents as select * from read_parquet('/root/testdata/sf0.01/documents.parquet')")
# wilson upper SQL macro text: count c (double), nobs n (double)
def wilson(c, n):
    return (f"least(1.0, greatest(0.0, (({c}/{n}) + ({z}*{z})/(2.0*{n})) / (1.0 + ({z}*{z})/{n})"
            f" + ({z} / (1.0 + ({z}*{z})/{n})) * sqrt(({c}/{n})*(1.0-({c}/{n}))/{n} + ({z}*{z})/(4.0*{n}*{n}))))")

SQL = f"""
WITH d AS (
  SELECT source || '_' || lang AS fine, source,
         CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END AS y
  FROM documents
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
fc AS (SELECT fine, source, CAST(count(*) AS DOUBLE) AS cnt, sum(y) AS sy FROM d GROUP BY 1, 2),
b1 AS (
  SELECT fine, CASE WHEN {wilson('cnt','tot.n')} < 0.04 THEN source ELSE fine END AS b, cnt, sy
  FROM fc, tot
),
bc AS (SELECT b, sum(cnt) AS bcnt FROM b1 GROUP BY b),
b2 AS (
  SELECT bc.b, CASE WHEN {wilson('bc.bcnt','tot.n')} < 0.04 THEN '__OTHER__' ELSE bc.b END AS fb
  FROM bc, tot
)
SELECT b1.fine AS raw, b2.fb AS bucket
FROM b1 JOIN b2 ON b1.b = b2.b
ORDER BY raw
"""
got = con.execute(SQL).fetchall()
print("rows:", len(got))
for r in got[:6]: print(r)
