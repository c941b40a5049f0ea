#!/usr/bin/env python3
"""Execute the REFERENCE carvers on the sf0.01 documents table with the same
configs as SparkEntry's q_carve_* queries; emit expected rows as DuckDB
VALUES-oracle SQL into src/main/resources/graft/carve_oracle_sql.json.

Provenance: every rate/count/boundary/code in the emitted SQL is REFERENCE
OUTPUT (AutoCarver executed via tools/scishim.py numpy stand-ins for the
scipy/sklearn statistic calls), NOT engine output — this is the cross-engine
fixture oracle VERDICT.md round-2 item 9 prescribes. Labels are rendered from
the reference's raw bin contents with the engine's formatting conventions
(categorical members sorted for order-insensitivity; quantitative edges via
BinaryCarver.fmt semantics)."""
import json
import math
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, '/root/repo/tools')
import refload

AC = refload.load()
from AutoCarver.features import Features

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = "/root/repo/src/main/resources/graft/carve_oracle_sql.json"
docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id").reset_index(drop=True)

def token_count(s):
    s = s.strip()
    return 0 if not s else len(re.split(r"\s+", s))

docs["n_tokens"] = docs["text"].map(token_count).astype(float)

def fmt_num(d):
    """engine BinaryCarver.fmt: integral -> Long string, else Java %.6g."""
    if d == float(int(d)) and abs(d) < 1e15:
        return str(int(d))
    s = "%.6g" % d
    return s

def rnd6(x):
    """engine BigDecimal(...).setScale(6, HALF_EVEN) on a double."""
    if isinstance(x, float) and math.isnan(x):
        return float("nan")
    return float(round(float(x), 6))

def feature_labels(f):
    """bin label strings (engine conventions) per label index, from the
    reference fitted feature's raw GroupedList content."""
    content = f.values.content
    if getattr(f, "is_quantitative", False):
        out, lo = [], "-inf"
        for leader, grp in content.items():
            nums = [v for v in grp if isinstance(v, (int, float))]
            has_nan = any(isinstance(v, str) and v == "__NAN__" for v in grp)
            if not nums:  # pure-NaN bin
                out.append("__NAN__")
                continue
            hi = max(nums)
            hi_s = "+inf" if np.isinf(hi) else fmt_num(hi)
            base = f"({lo}, {hi_s}]"
            # engine quantLabelOf: a quantitative bin that absorbed NaN
            out.append(base + " or __NAN__" if has_nan else base)
            if not np.isinf(hi):
                lo = hi_s
        return out
    # categorical: members sorted (order-insensitive compare on both sides)
    return [", ".join(sorted(str(m) for m in grp)) for grp in content.values()]

def sql_values(rows, cols, types):
    def lit(v, t):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return f"NULL::{t}"
        if t == "VARCHAR":
            return "'" + str(v).replace("'", "''") + "'"
        if t == "BOOLEAN":
            return "true" if v else "false"
        if t == "DOUBLE":
            return repr(float(v)) + "::DOUBLE"
        return str(int(v)) + f"::{t}"
    vals = ",\n".join("(" + ", ".join(lit(v, t) for v, t in zip(r, types)) + ")" for r in rows)
    collist = ", ".join(cols)
    return f"SELECT * FROM (VALUES {vals}) AS t({collist})"

oracle = {}

y_bin = (docs["n_chars"] > 300).astype(int)
y_ord = (1 + (docs["n_chars"] > 150).astype(int) + (docs["n_chars"] > 300).astype(int)
         + (docs["n_chars"] > 450).astype(int))
y_mc = np.where(docs["n_chars"] > 350, "high", np.where(docs["n_chars"] > 200, "mid", "low"))

def fit_rows(carver, feature_names, rate_col="target_mean"):
    """(feature, bin, bin_label, rate, n) rows in the engine's q_carve shape,
    from the fitted reference carver's summary + raw contents."""
    summ = carver.summary.reset_index()
    rows = []
    for fname in feature_names:
        f = [x for x in carver.features if x.name == fname][0]
        labels = feature_labels(f)
        sub = summ[summ["feature"].str.contains(f"'{fname}'")]
        for _, r in sub.iterrows():
            i = int(r["label"])
            rows.append((fname, i, labels[i], rnd6(r[rate_col]), int(round(r["count"]))))
    return rows

# ------------------------------------------------------------- q_carve_fit
X = docs[["n_chars", "lang", "source"]].copy(); X["n_chars"] = X["n_chars"].astype(float)
feats = Features(categoricals=["lang", "source"], numericals=["n_chars"])
bc = AC.BinaryCarver(feats, min_freq=0.02, max_n_mod=5)
bc.fit(X.copy(), y_bin)
rows = fit_rows(bc, ["n_chars", "lang", "source"])
oracle["q_carve_fit"] = sql_values(rows,
    ["feature", "bin", "bin_label", "rate", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_fit rows:", len(rows))

# ------------------------------------------------------- q_carve_transform
codes = bc.transform(X.copy())
trows = [(int(d), int(a), int(b), int(c)) for d, a, b, c in
         zip(docs["doc_id"], codes["n_chars"], codes["lang"], codes["source"])]
oracle["q_carve_transform"] = sql_values(trows,
    ["doc_id", "n_chars_bin", "lang_bin", "source_bin"],
    ["BIGINT", "INTEGER", "INTEGER", "INTEGER"])
print("q_carve_transform rows:", len(trows))

# ------------------------------------------------------ q_carve_continuous
Xc = docs[["n_chars", "lang"]].copy(); Xc["n_chars"] = Xc["n_chars"].astype(float)
cc = AC.ContinuousCarver(Features(categoricals=["lang"], numericals=["n_chars"]),
                         min_freq=0.02, max_n_mod=5)
cc.fit(Xc.copy(), docs["n_tokens"])
rows = fit_rows(cc, ["n_chars", "lang"])
oracle["q_carve_continuous"] = sql_values(rows,
    ["feature", "bin", "bin_label", "mean_y", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_continuous rows:", len(rows))

# ---------------------------------------------------------- q_carve_median
# R4 TargetMedian rate (continuous_target_rates.py:127-138): same continuous
# config, evaluator built with target_rate=TargetMedian(). y (token count)
# is low-cardinality, so the engine's exact histogram path applies (the
# gated percentile-grid path is pinned separately by ContinuousSpec).
from AutoCarver.combinations import KruskalCombinations
from AutoCarver.combinations.continuous.continuous_target_rates import TargetMedian

cm = AC.ContinuousCarver(Features(categoricals=["lang"], numericals=["n_chars"]),
                         min_freq=0.02, max_n_mod=5,
                         combination_evaluator=KruskalCombinations(target_rate=TargetMedian()))
cm.fit(Xc.copy(), docs["n_tokens"])
rows = fit_rows(cm, ["n_chars", "lang"], rate_col="target_median")
oracle["q_carve_median"] = sql_values(rows,
    ["feature", "bin", "bin_label", "median_y", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_median rows:", len(rows))

# --------------------------------------------------------- q_carve_ordinal
Xo = docs[["n_tokens", "lang"]].copy()
oc = AC.OrdinalCarver(Features(categoricals=["lang"], numericals=["n_tokens"]),
                      min_freq=0.02, max_n_mod=5)
oc.fit(Xo.copy(), y_ord)
rows = fit_rows(oc, ["n_tokens", "lang"], rate_col="target_mean_ridit")
oracle["q_carve_ordinal"] = sql_values(rows,
    ["feature", "bin", "bin_label", "mean_ridit", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_ordinal rows:", len(rows))

# ----------------------------------------------------------- q_carve_level
# R6 TargetMeanLevel rate (ordinal_target_rates.py:94-139): the ordinal
# config re-scored with the integer level scale instead of ridits.
from AutoCarver.combinations import KendallTauCCombinations
from AutoCarver.combinations.ordinal.ordinal_target_rates import TargetMeanLevel

olv = AC.OrdinalCarver(Features(categoricals=["lang"], numericals=["n_tokens"]),
                       min_freq=0.02, max_n_mod=5,
                       combination_evaluator=KendallTauCCombinations(target_rate=TargetMeanLevel()))
olv.fit(Xo.copy(), y_ord)
rows = fit_rows(olv, ["n_tokens", "lang"], rate_col="target_mean_level")
oracle["q_carve_level"] = sql_values(rows,
    ["feature", "bin", "bin_label", "mean_level", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_level rows:", len(rows))

# ------------------------------------------------------ q_carve_multiclass
mc = AC.MulticlassCarver(Features(categoricals=["lang"], numericals=["n_tokens"]),
                         min_freq=0.02, max_n_mod=5)
mc.fit(Xo.copy(), pd.Series(y_mc))
rows = fit_rows(mc, ["n_tokens", "lang"], rate_col="ca_score")
oracle["q_carve_multiclass"] = sql_values(rows,
    ["feature", "bin", "bin_label", "ca_score", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_multiclass rows:", len(rows))

# ------------------------------------------------------------- q_carve_ovr
ovr = AC.OneVsRestCarver(Features(categoricals=["lang"], numericals=["n_tokens"]),
                         min_freq=0.02, max_n_mod=5)
ovr.fit(Xo.copy(), pd.Series(y_mc))
osumm = ovr.summary.reset_index()
orows = []
for f in ovr.features:
    # the per-class feature carries the class in `version` ("lang__y=low")
    m = re.match(r"^(.*)__y=(.*)$", f.version)
    if not m:
        continue
    base, ycls = m.group(1), m.group(2)
    labels = feature_labels(f)
    sub = osumm[osumm["feature"].str.contains(f"'{re.escape(f.version)}'", regex=True)]
    for _, r in sub.iterrows():
        i = int(r["label"])
        orows.append((ycls, base, i, labels[i], rnd6(r["target_mean"]), int(round(r["count"]))))
oracle["q_carve_ovr"] = sql_values(orows,
    ["y_class", "feature", "bin", "bin_label", "rate", "n"],
    ["VARCHAR", "VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_ovr rows:", len(orows))

# ---------------------------------------------------------- q_ovr_transform
# S2 oracle: the reference's per-class feature VERSIONS (`<feat>__y=<class>`,
# `features/features.py:866`) pinned WIDE — the driver's column-name compare
# then checks the aliasing itself, not just the codes.
otr = ovr.transform(Xo.copy())
vcols = sorted(c for c in otr.columns if "__y=" in c)
ovrows = [(int(d), *[int(otr[c].iloc[i]) for c in vcols])
          for i, d in enumerate(docs["doc_id"])]
oracle["q_ovr_transform"] = sql_values(ovrows,
    ["doc_id"] + [f'"{c}"' for c in vcols],
    ["BIGINT"] + ["INTEGER"] * len(vcols))
print("q_ovr_transform rows:", len(ovrows), "cols:", vcols)

# ------------------------------------------------------------ q_carve_nested
# NestedFeature fit INSIDE BinaryCarver (P6 carver integration): the finest
# column `fine` = source_lang rolls up to `source` where rare, then carves
# as a qualitative feature (tests/features/qualitatives/test_nested_feature.py
# is the behavior class).
Xn = docs[["source"]].copy()
Xn["fine"] = docs["source"] + "_" + docs["lang"]
nc = AC.BinaryCarver(Features(nested={"fine": ["source"]}), min_freq=0.04, max_n_mod=5)
nc.fit(Xn[["fine", "source"]].copy(), y_bin)
rows = fit_rows(nc, ["fine"])
oracle["q_carve_nested"] = sql_values(rows,
    ["feature", "bin", "bin_label", "rate", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_nested rows:", len(rows))

# ---------------------------------------------------------------- q_select
# Reference ClassificationSelector(n_best_features=2) decides the
# kept/dropped statuses (the cross-engine part); the association column is
# recomputed by DuckDB from raw data with the engine's preset measures
# (Kruskal-eta2 for quantitatives, Tschuprow's T for qualitatives).
from AutoCarver.selectors import ClassificationSelector

Xs = docs[["n_chars", "doc_id", "lang", "source"]].copy()
Xs["n_chars"] = Xs["n_chars"].astype(float)
Xs["doc_id"] = Xs["doc_id"].astype(float)
ssel = ClassificationSelector(
    Features(categoricals=["lang", "source"], numericals=["n_chars", "doc_id"]),
    n_best_features=2)
ssel.fit(Xs.copy(), y_bin)
kept = {f.version for f in ssel.selected_features}
print("reference selector kept:", sorted(kept))
kind = {"n_chars": "quantitative", "doc_id": "quantitative",
        "lang": "categorical", "source": "categorical"}
fix_rows = ",".join(
    f"('{f}', '{kind[f]}', '{'kept' if f in kept else 'dropped'}')"
    for f in ["n_chars", "doc_id", "lang", "source"])

def kruskal_eta_sql(expr):
    return f"""(
      WITH g AS (SELECT {expr} AS v, y, count(*) AS cnt FROM d GROUP BY 1, 2),
      xt AS (SELECT v, CAST(sum(cnt) AS DOUBLE) AS n FROM g GROUP BY 1),
      rx AS (SELECT v, n, sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - n + (n + 1) / 2.0 AS rx FROM xt),
      j AS (SELECT g.y, sum(g.cnt * rx.rx) AS rg, CAST(sum(g.cnt) AS DOUBLE) AS ng
            FROM g JOIN rx USING (v) GROUP BY g.y),
      t AS (SELECT sum(n * n * n - n) AS tsum, sum(n) AS nn FROM xt),
      k AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM j)
      SELECT greatest(0.0,
        ((12.0 / (nn * (nn + 1)) * (SELECT sum(rg * rg / ng) FROM j) - 3 * (nn + 1))
         / (1 - tsum / (nn * nn * nn - nn)) - k + 1.0) / (nn - k))
      FROM t, k)"""

def tschuprowt_sql(colname):
    return f"""(
      WITH ct AS (SELECT {colname} AS v, y, CAST(count(*) AS DOUBLE) AS c FROM d GROUP BY 1, 2),
      rs AS (SELECT v, sum(c) AS rc FROM ct GROUP BY v),
      cs AS (SELECT y, sum(c) AS cc FROM ct GROUP BY y),
      tt AS (SELECT sum(c) AS n FROM ct),
      cells AS (
        SELECT rs.v, cs.y, coalesce(ct.c, 0.0) AS o, rs.rc * cs.cc / tt.n AS e
        FROM rs CROSS JOIN cs CROSS JOIN tt LEFT JOIN ct ON ct.v = rs.v AND ct.y = cs.y
      ),
      chi AS (SELECT sum((o - e) * (o - e) / e) AS chi2, count(DISTINCT v) AS r FROM cells)
      SELECT sqrt(chi2 / tt.n / sqrt((r - 1.0) * 1.0)) FROM chi, tt)"""

oracle["q_select"] = f"""WITH d AS (
  SELECT CAST(n_chars AS DOUBLE) AS nc, CAST(doc_id AS DOUBLE) AS di, lang, source,
         CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS y
  FROM documents
),
assoc(feature, a) AS (
  SELECT 'n_chars', {kruskal_eta_sql('nc')}
  UNION ALL SELECT 'doc_id', {kruskal_eta_sql('di')}
  UNION ALL SELECT 'lang', {tschuprowt_sql('lang')}
  UNION ALL SELECT 'source', {tschuprowt_sql('source')}
),
fix(feature, kind, status) AS (VALUES {fix_rows})
SELECT f.feature, f.kind, f.status, round(a.a, 6) AS association
FROM fix f JOIN assoc a USING (feature)"""

# ------------------------------------------------------------- q_stability
# Reference evaluate_stability on a reference-fitted BinaryCarver (fit
# parity already pinned by q_carve_fit) over the same shifted sample.
from AutoCarver.stability import evaluate_stability

sh = docs[docs["n_chars"] > 200]
Xsh = sh[["n_chars", "lang", "source"]].copy(); Xsh["n_chars"] = Xsh["n_chars"].astype(float)
ysh = (sh["n_chars"] > 300).astype(int)
rep = evaluate_stability(bc, Xsh.copy(), ysh)
pf = rep.per_feature if hasattr(rep, "per_feature") else rep.summary
unstable_set = set()
for n in rep.unstable_features:
    mm = re.search(r"'([^']+)'", str(n))
    unstable_set.add(mm.group(1) if mm else str(n))
srows = []
for _, r in pf.reset_index().iterrows():
    mm = re.search(r"'([^']+)'", str(r["feature"]))
    fname = mm.group(1) if mm else str(r["feature"])
    srows.append((fname, rnd6(r["psi"]), str(r["psi_flag"]), rnd6(r["chi2"]),
                  rnd6(-math.log10(r["chi2_pvalue"])), bool(r["chi2_significant"]),
                  rnd6(r["chi2_cramerv"]), bool(r["viable"]), fname in unstable_set))
oracle["q_stability"] = sql_values(srows,
    ["feature", "psi", "psi_flag", "chi2_stat", "chi2_nlog10p",
     "chi2_significant", "chi2_v", "viable", "unstable"],
    ["VARCHAR", "DOUBLE", "VARCHAR", "DOUBLE", "DOUBLE", "BOOLEAN", "DOUBLE", "BOOLEAN", "BOOLEAN"])
print("q_stability rows:", len(srows), "unstable:", sorted(unstable_set))

# -------------------------------------------------------- q_carve_datetime
# Datetime carve (T3 under hard oracle): ts2 = ts + floor(value) minutes
# (NaT every 7th event) carved row-wise against ts; ts carved against the
# fixed literal "2024-01-01". DECLARATION ORDER MATTERS in the reference:
# cast_datetime_features (base_discretizer.py:715-733) converts IN PLACE in
# feature order, so a reference column converted before its dependents
# poisons the row-wise delta (floats re-coerced as epoch-nanoseconds). The
# dependent is therefore declared FIRST — the sane, and engine-matching,
# order.
ev = pd.read_parquet(f"{SF}/events.parquet").sort_values("event_id").reset_index(drop=True)
ts2 = (ev["ts"] + pd.to_timedelta(np.floor(ev["value"]) * 60, unit="s")).mask(ev["event_id"] % 7 == 0)
y_dt = ((ev["ts"].dt.day > 15) | (ev["value"] > 200)).astype(int)
Xdt = pd.DataFrame({"ts": ev["ts"], "ts2": ts2})
dtc = AC.BinaryCarver(Features(datetimes=[("ts2", "ts"), ("ts", "2024-01-01")]),
                      min_freq=0.02, max_n_mod=5)
dtc.fit(Xdt.copy(), y_dt)
rows = fit_rows(dtc, [f.name for f in dtc.features])
oracle["q_carve_datetime"] = sql_values(rows,
    ["feature", "bin", "bin_label", "rate", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_datetime rows:", len(rows))

# ---------------------------------------------------------- q_carve_rescue
# Rescue-rare under hard oracle (combination_evaluator.py:507-516): a
# dominant-mode categorical (source=='src1' → 'rare', 5.2% < half_min_freq)
# fails the qualitative frequency check at min_freq=0.15; rescue_rare keeps
# it and the min_freq-waived rerun accepts the 2-bin split because the
# target signal holds on X_dev (docs 250+).
from AutoCarver.discretizers import ProcessingConfig

Xr = pd.DataFrame({"grp": np.where(docs["source"] == "src1", "rare", "common")})
tr_mask = docs["doc_id"] < 250
rc = AC.BinaryCarver(Features(categoricals=["grp"]), min_freq=0.15, max_n_mod=5,
                     config=ProcessingConfig(rescue_rare=True))
rc.fit(Xr[tr_mask].reset_index(drop=True), y_bin[tr_mask].reset_index(drop=True),
       X_dev=Xr[~tr_mask].reset_index(drop=True), y_dev=y_bin[~tr_mask].reset_index(drop=True))
rows = fit_rows(rc, [f.name for f in rc.features])
assert rows, "rescue fixture degenerated: feature dropped"
oracle["q_carve_rescue"] = sql_values(rows,
    ["feature", "bin", "bin_label", "rate", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_rescue rows:", len(rows))

# --------------------------------------------------------- q_carve_foldcol
# External fold assignment replayed through check_cv (base_carver.py:607-628):
# folds are doc_id % 3 passed as an iterable of (train_idx, test_idx) pairs —
# the engine replays the SAME assignment via Config.foldCol. Pins both the
# fold plumbing and the per-fold veto (lang drops under these folds).
fold = (docs["doc_id"] % 3).to_numpy()
cv_pairs = [(np.where(fold != k)[0], np.where(fold == k)[0]) for k in range(3)]
Xf = docs[["n_chars", "lang"]].copy(); Xf["n_chars"] = Xf["n_chars"].astype(float)
fc = AC.BinaryCarver(Features(categoricals=["lang"], numericals=["n_chars"]),
                     min_freq=0.02, max_n_mod=5)
fc.fit(Xf.copy(), y_bin, cv=cv_pairs)
rows = fit_rows(fc, [f.name for f in fc.features])
oracle["q_carve_foldcol"] = sql_values(rows,
    ["feature", "bin", "bin_label", "rate", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_foldcol rows:", len(rows), "dropped:", [f.name for f in fc.dropped_features])

# -------------------------------------------------------- q_carve_fit_sf01
# The q_carve_fit config re-executed on the 10× table (sf0.1, 5000 docs):
# catches quantile-edge/tie flips the 500-row fixtures cannot see
# (SURVEY §7.4 risk).
SF01 = "/root/testdata/sf0.1"
docs01 = pd.read_parquet(f"{SF01}/documents.parquet").sort_values("doc_id").reset_index(drop=True)
y01 = (docs01["n_chars"] > 300).astype(int)
X01 = docs01[["n_chars", "lang", "source"]].copy(); X01["n_chars"] = X01["n_chars"].astype(float)
b01 = AC.BinaryCarver(Features(categoricals=["lang", "source"], numericals=["n_chars"]),
                      min_freq=0.02, max_n_mod=5)
b01.fit(X01.copy(), y01)
rows = fit_rows(b01, [f.name for f in b01.features])
oracle["q_carve_fit_sf01"] = sql_values(rows,
    ["feature", "bin", "bin_label", "rate", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_fit_sf01 rows:", len(rows))

# ------------------------------------------------- q_carve_continuous_sf01
# The continuous family at 10x rows: the rank-stat aggregation (Kruskal) and
# per-bin means see 10x the ties — catches tie-ordering flips the 500-row
# fixture cannot (same SURVEY 7.4 risk class as q_carve_fit_sf01).
docs01["n_tokens"] = docs01["text"].map(token_count).astype(float)
Xc01 = docs01[["n_chars", "lang"]].copy(); Xc01["n_chars"] = Xc01["n_chars"].astype(float)
cc01 = AC.ContinuousCarver(Features(categoricals=["lang"], numericals=["n_chars"]),
                           min_freq=0.02, max_n_mod=5)
cc01.fit(Xc01.copy(), docs01["n_tokens"].astype(float))
rows = fit_rows(cc01, ["n_chars", "lang"])
oracle["q_carve_continuous_sf01"] = sql_values(rows,
    ["feature", "bin", "bin_label", "mean_y", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_continuous_sf01 rows:", len(rows))

# ---------------------------------------------------- q_carve_ordinal_sf01
# The ordinal family at 10x rows: ridit scores shift with every level's
# frequency, so tie-heavy levels stress the K-crosstab + tau-b path.
y01_ord = (1 + (docs01["n_chars"] > 150).astype(int) + (docs01["n_chars"] > 300).astype(int)
           + (docs01["n_chars"] > 450).astype(int))
Xo01 = docs01[["n_tokens", "lang"]].copy()
oc01 = AC.OrdinalCarver(Features(categoricals=["lang"], numericals=["n_tokens"]),
                        min_freq=0.02, max_n_mod=5)
oc01.fit(Xo01.copy(), y01_ord)
rows = fit_rows(oc01, ["n_tokens", "lang"], rate_col="target_mean_ridit")
oracle["q_carve_ordinal_sf01"] = sql_values(rows,
    ["feature", "bin", "bin_label", "mean_ridit", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_ordinal_sf01 rows:", len(rows))

# ------------------------------------------------------------ q_select_sf01
# The selector at 10x rows: the reference ClassificationSelector decides
# kept/dropped on sf0.1; the association column is recomputed by DuckDB
# from the sf0.1 parquet directly (absolute path — the driver's views are
# bound to the verify sfdir, but DuckDB reads paths natively).
Xs01 = docs01[["n_chars", "doc_id", "lang", "source"]].copy()
Xs01["n_chars"] = Xs01["n_chars"].astype(float)
Xs01["doc_id"] = Xs01["doc_id"].astype(float)
ssel01 = ClassificationSelector(
    Features(categoricals=["lang", "source"], numericals=["n_chars", "doc_id"]),
    n_best_features=2)
ssel01.fit(Xs01.copy(), y01)
kept01 = {f.version for f in ssel01.selected_features}
print("reference selector kept (sf0.1):", sorted(kept01))
fix_rows01 = ",".join(
    f"('{f}', '{kind[f]}', '{'kept' if f in kept01 else 'dropped'}')"
    for f in ["n_chars", "doc_id", "lang", "source"])

# ------------------------------------------------------------ q_carve_dropna
# ProcessingConfig(dropna=False): NaN never joins a bin and stays raw in the
# transform output; fit + transform pinned on columns with injected nulls
# (lang_nan: every 5th doc; nc_nan: every 7th doc).
from AutoCarver.discretizers import ProcessingConfig

Xdn = docs[["n_chars", "lang"]].copy()
Xdn["lang_nan"] = np.where(docs["doc_id"] % 5 == 0, None, docs["lang"])
Xdn["nc_nan"] = np.where(docs["doc_id"] % 7 == 0, np.nan, docs["n_chars"].astype(float))
Xdn = Xdn[["lang_nan", "nc_nan"]]
dnc = AC.BinaryCarver(Features(categoricals=["lang_nan"], numericals=["nc_nan"]),
                      min_freq=0.02, max_n_mod=5,
                      config=ProcessingConfig(dropna=False, ordinal_encoding=True, copy=True))
dnc.fit(Xdn.copy(), y_bin)
rows = fit_rows(dnc, [f.name for f in dnc.features])
oracle["q_carve_dropna"] = sql_values(rows,
    ["feature", "bin", "bin_label", "rate", "n"],
    ["VARCHAR", "BIGINT", "VARCHAR", "DOUBLE", "BIGINT"])
print("q_carve_dropna rows:", len(rows), "kept:", [f.name for f in dnc.features])

# transform: null codes must stay null (unfillna) — pinned WIDE per doc_id
dtr = dnc.transform(Xdn.copy())
dnrows = []
for i, d in enumerate(docs["doc_id"]):
    def code(c):
        v = dtr[c].iloc[i]
        return None if pd.isna(v) else int(v)
    dnrows.append((int(d), code("lang_nan"), code("nc_nan")))
oracle["q_carve_dropna_transform"] = sql_values(dnrows,
    ["doc_id", "lang_nan_bin", "nc_nan_bin"],
    ["BIGINT", "INTEGER", "INTEGER"])
print("q_carve_dropna_transform rows:", len(dnrows),
      "nulls:", int(dtr["lang_nan"].isna().sum()), int(dtr["nc_nan"].isna().sum()))
oracle["q_select_sf01"] = f"""WITH d AS (
  SELECT CAST(n_chars AS DOUBLE) AS nc, CAST(doc_id AS DOUBLE) AS di, lang, source,
         CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS y
  FROM '{SF01}/documents.parquet'
),
assoc(feature, a) AS (
  SELECT 'n_chars', {kruskal_eta_sql('nc')}
  UNION ALL SELECT 'doc_id', {kruskal_eta_sql('di')}
  UNION ALL SELECT 'lang', {tschuprowt_sql('lang')}
  UNION ALL SELECT 'source', {tschuprowt_sql('source')}
),
fix(feature, kind, status) AS (VALUES {fix_rows01})
SELECT f.feature, f.kind, f.status, round(a.a, 6) AS association
FROM fix f JOIN assoc a USING (feature)"""

json.dump(oracle, open(OUT, "w"), indent=1)
print("wrote", OUT, "entries:", list(oracle))
