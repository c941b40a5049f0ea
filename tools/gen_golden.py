#!/usr/bin/env python3
"""Generate golden parity fixtures by executing the REFERENCE's pure-math
modules (chi2, interval DP, quantile finder, ordinal merge) on fixed inputs,
and dump expected outputs as JSON for the Scala test suite.

Only numpy/pandas-dependent modules are loaded (scipy/sklearn are absent in
this sandbox); modules are loaded directly from file to skip package
__init__ side effects. Fixture OUTPUTS go into src/test/resources/golden/.
"""
import importlib.util
import json
import sys
import types

import numpy as np

REF = "/root/reference/AutoCarver"
OUT = "src/test/resources/golden"


def load(name, path, preload=None):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


# ---- stub the heavy package deps the pure modules import -------------------
# combinations.py imports AutoCarver.features (GroupedList, BaseFeature)
features_stub = types.ModuleType("AutoCarver.features")


class GroupedList(list):
    def __init__(self, it=()):
        super().__init__(it)


features_stub.GroupedList = GroupedList
features_stub.BaseFeature = object
sys.modules["AutoCarver"] = types.ModuleType("AutoCarver")
sys.modules["AutoCarver.features"] = features_stub

chi2 = load("AutoCarver.stats.chi2", f"{REF}/stats/chi2.py")
sys.modules["AutoCarver.stats"] = types.ModuleType("AutoCarver.stats")
sys.modules["AutoCarver.stats.chi2"] = chi2
combos = load("AutoCarver.combinations.utils.combinations", f"{REF}/combinations/utils/combinations.py")
sys.modules["AutoCarver.combinations.utils.combinations"] = combos
dp = load("AutoCarver.combinations.utils.dp", f"{REF}/combinations/utils/dp.py")

# extract _top_k_partitions_chi2_dp without importing the scipy-dependent module
src = open(f"{REF}/combinations/binary/binary_combination_evaluators.py").read()
start = src.index("def _top_k_partitions_chi2_dp")
fn_src = src[start:]
ns = {
    "np": np,
    "top_k_partitions": dp.top_k_partitions,
    "splits_to_combination": dp.splits_to_combination,
    "combination_formatter": combos.combination_formatter,
}
exec(compile(fn_src, "binary_dp", "exec"), ns)
top_k_chi2 = ns["_top_k_partitions_chi2_dp"]

cont = load("cont_disc", f"{REF}/discretizers/quantitatives/continuous_discretizer.py").__dict__ \
    if False else None
# continuous_discretizer imports base_discretizer (heavy). Extract find_quantiles only.
src_q = open(f"{REF}/discretizers/quantitatives/continuous_discretizer.py").read()
start_q = src_q.index("def find_quantiles")
ns_q = {"np": np}
exec(compile(src_q[start_q:], "find_quantiles", "exec"), ns_q)
find_quantiles = ns_q["find_quantiles"]

# ordinal merge helpers (no heavy deps in the functions themselves)
src_o = open(f"{REF}/discretizers/qualitatives/ordinal_discretizer.py").read()
start_o = src_o.index("def find_closest_modality")
ns_o = {"np": np}
exec(compile(src_o[start_o:], "ordinal", "exec"), ns_o)
find_closest_modality = ns_o["find_closest_modality"]

out = {}

# ---- chi2 / V / T cases -----------------------------------------------------
rng = np.random.default_rng(7)
chi2_cases = []
tables = [
    [[10.0, 5.0], [3.0, 20.0], [7.0, 7.0]],
    [[10.0, 5.0], [3.0, 20.0]],
    [[100.0, 1.0], [1.0, 100.0]],
    [[5.0, 5.0], [5.0, 5.0], [5.0, 5.0]],
    [[0.0, 10.0], [10.0, 0.0], [5.0, 5.0], [1.0, 9.0]],
]
for _ in range(10):
    b = int(rng.integers(2, 8))
    t = rng.integers(0, 50, size=(b, 2)).astype(float).tolist()
    tables.append(t)
tol = 1e-10
for t in tables:
    obs = np.array(t)
    n_obs = float(obs.sum())
    c = chi2.pearson_chi2(obs + tol)
    v, tt = chi2.cramerv_tschuprowt(c, n_obs, obs.shape[0], obs.shape[1], tol)
    chi2_cases.append({
        "table": t, "n_obs": n_obs, "chi2": c,
        "cramerv": None if np.isnan(v) else v,
        "tschuprowt": None if (isinstance(tt, float) and np.isnan(tt)) else tt,
    })
out["chi2_cases"] = chi2_cases

# ---- chi2 DP top-K ----------------------------------------------------------
dp_cases = []
for trial in range(6):
    n_mod = int(rng.integers(3, 12))
    n0 = rng.integers(0, 200, size=n_mod).astype(float)
    n1 = rng.integers(0, 200, size=n_mod).astype(float)
    labels = [f"m{i:04d}" for i in range(n_mod)]
    for sort_by in ("tschuprowt", "cramerv"):
        res = top_k_chi2(n0, n1, max_n_mod=5, raw_index=labels, sort_by=sort_by, top_k=50)
        dp_cases.append({
            "n0": n0.tolist(), "n1": n1.tolist(), "labels": labels,
            "max_n_mod": 5, "sort_by": sort_by, "top_k": 50,
            "expected": [
                {"combination": r["combination"], "cramerv": r["cramerv"], "tschuprowt": r["tschuprowt"]}
                for r in res
            ],
        })
out["dp_cases"] = dp_cases

# ---- find_quantiles ----------------------------------------------------------
fq_cases = []
datasets = [
    rng.normal(0, 1, 1000),
    rng.gamma(2.0, 1.0, 2000),
    np.concatenate([np.zeros(500), rng.normal(5, 1, 500)]),  # over-represented 0
    np.concatenate([np.full(300, 1.0), np.full(300, 2.0), rng.uniform(0, 10, 400)]),
    rng.integers(1, 8, size=1000).astype(float),  # discrete
    np.concatenate([rng.normal(0, 1, 900), np.full(100, np.nan)]),  # with NaN
]
for data in datasets:
    for q in (10, 50, 100):
        qs = find_quantiles(data.copy(), q=q)
        clean = data[~np.isnan(data)]
        u, c = np.unique(np.sort(clean), return_counts=True)
        fq_cases.append({
            "unique": u.tolist(), "counts": c.astype(int).tolist(),
            "total": int(len(data)), "q": q, "expected": qs,
        })
out["fq_cases"] = fq_cases

# ---- find_closest_modality tie-break table -----------------------------------
fcm_cases = []
for _ in range(40):
    n = int(rng.integers(2, 8))
    freqs = rng.uniform(0, 0.2, n)
    rates = rng.uniform(0, 1, n)
    idx = int(rng.integers(0, n))
    if rng.random() < 0.2:
        freqs[idx] = 0.0
    got = find_closest_modality(idx, freqs, rates, 0.05)
    fcm_cases.append({
        "idx": idx, "freqs": freqs.tolist(), "rates": rates.tolist(),
        "min_freq": 0.05, "expected": int(got),
    })
out["fcm_cases"] = fcm_cases

# ---- nan fanout order ----------------------------------------------------------
base = [{"combination": [["a"], ["b", "c"]]}, {"combination": [["a", "b"], ["c"]]}]
variants = list(dp.nan_fanout_variants(base, "__NAN__", ["a", "b", "c"], 3))
out["nan_fanout"] = {
    "base": [b["combination"] for b in base],
    "raw_labels": ["a", "b", "c"], "max_n_mod": 3,
    "expected": variants,
}

import os
os.makedirs(OUT, exist_ok=True)
with open(f"{OUT}/parity.json", "w") as f:
    json.dump(out, f)
print(f"wrote {OUT}/parity.json:",
      {k: (len(v) if isinstance(v, list) else 1) for k, v in out.items()})

# ---- kruskal DP parity (extracted from continuous_combination_evaluators) ----
src_k = open(f"{REF}/combinations/continuous/continuous_combination_evaluators.py").read()
start_k = src_k.index("def _top_k_partitions_kruskal_dp")
ns_k = {
    "np": np,
    "top_k_partitions": dp.top_k_partitions,
    "splits_to_combination": dp.splits_to_combination,
    "combination_formatter": combos.combination_formatter,
}
exec(compile(src_k[start_k:], "kruskal_dp", "exec"), ns_k)
top_k_kruskal = ns_k["_top_k_partitions_kruskal_dp"]

kw_cases = []
rng2 = np.random.default_rng(11)
for _ in range(6):
    n_mod = int(rng2.integers(3, 12))
    n = rng2.integers(1, 300, size=n_mod).astype(np.int64)
    N = int(n.sum())
    # synthetic rank sums: partition ranks 1..N among modalities
    perm = rng2.permutation(N) + 1
    offs = np.concatenate([[0], np.cumsum(n)])
    R = np.array([perm[offs[i]:offs[i+1]].sum() for i in range(n_mod)], dtype=float)
    tie = float(rng2.uniform(0.9, 1.0))
    res = top_k_kruskal(R, n, N, tie, max_n_mod=5, raw_index=[f"m{i:04d}" for i in range(n_mod)], top_k=40)
    kw_cases.append({
        "R": R.tolist(), "n": n.tolist(), "N": N, "tie": tie,
        "expected": [{"combination": r["combination"], "kruskal": r["kruskal"]} for r in res],
    })
out2 = {"kruskal_dp": kw_cases}
with open(f"{OUT}/parity_kruskal.json", "w") as f:
    json.dump(out2, f)
print("wrote parity_kruskal.json", len(kw_cases))

# ---- ordinal: associations, DP, ridits (round 2) ---------------------------
import pandas as pd

ridits_mod = load("AutoCarver.stats.ridits", f"{REF}/stats/ridits.py")
sys.modules["AutoCarver.stats.ridits"] = ridits_mod

src_ord = open(f"{REF}/combinations/ordinal/ordinal_combination_evaluators.py").read()
start_ord = src_ord.index("def _concordant_minus_discordant")
ns_ord = {
    "np": np, "math": __import__("math"),
    "top_k_partitions": dp.top_k_partitions,
    "splits_to_combination": dp.splits_to_combination,
    "compact_empty_modalities": dp.compact_empty_modalities,
    "combination_formatter": combos.combination_formatter,
    "sort_key": dp.sort_key,
}
exec(compile(src_ord[start_ord:], "ordinal_eval", "exec"), ns_ord)
ordinal_assoc = ns_ord["_ordinal_associations"]
ordinal_dp = ns_ord["_top_k_partitions_ordinal_dp"]

out3 = {}
rng3 = np.random.default_rng(23)

oa_cases = []
for _ in range(20):
    r = int(rng3.integers(2, 9))
    c = int(rng3.integers(3, 7))
    t = rng3.integers(0, 60, size=(r, c)).astype(float)
    if rng3.random() < 0.3:
        t[int(rng3.integers(0, r))] = 0.0  # empty modality row
    got = ordinal_assoc(t)
    oa_cases.append({"table": t.tolist(),
                     "tau_b": got["tau_b"], "tau_c": got["tau_c"], "somersd": got["somersd"]})
out3["ordinal_assoc"] = oa_cases

odp_cases = []
for trial in range(6):
    n_mod = int(rng3.integers(3, 11))
    c = int(rng3.integers(3, 6))
    M = rng3.integers(0, 120, size=(n_mod, c)).astype(float)
    if trial % 2 == 0 and n_mod > 3:
        M[int(rng3.integers(0, n_mod))] = 0.0
    labels = [f"m{i:04d}" for i in range(n_mod)]
    for sort_by in ("tau_c", "tau_b", "somersd"):
        res = ordinal_dp(M, M.sum(axis=1), M.sum(axis=0), max_n_mod=5,
                         raw_index=labels, sort_by=sort_by, top_k=40)
        odp_cases.append({
            "M": M.tolist(), "labels": labels, "max_n_mod": 5, "sort_by": sort_by, "top_k": 40,
            "expected": [{"combination": r["combination"], "tau_b": r["tau_b"],
                          "tau_c": r["tau_c"], "somersd": r["somersd"]} for r in res],
        })
out3["ordinal_dp"] = odp_cases

ridit_cases = []
for _ in range(12):
    n_levels = int(rng3.integers(3, 8))
    ref_levels = sorted(rng3.choice(np.arange(0, 20), size=n_levels, replace=False).tolist())
    counts = rng3.integers(1, 100, size=n_levels).astype(float)
    query = sorted(set(ref_levels + rng3.integers(0, 22, size=3).tolist()))
    got = ridits_mod.ridit_scores_for_levels(query, pd.Series(counts, index=ref_levels))
    ridit_cases.append({"ref_levels": [float(x) for x in ref_levels], "ref_counts": counts.tolist(),
                        "query": [float(x) for x in query], "expected": got.tolist()})
out3["ridits"] = ridit_cases

with open(f"{OUT}/parity_ordinal.json", "w") as f:
    json.dump(out3, f)
print("wrote parity_ordinal.json",
      {k: len(v) for k, v in out3.items()})

# ---- multiclass: K-col chi2 DP + CA axis (round 2) --------------------------
ca = load("AutoCarver.stats.correspondence_analysis", f"{REF}/stats/correspondence_analysis.py")

src_mc = open(f"{REF}/combinations/multiclass/multiclass_combination_evaluators.py").read()
start_mc = src_mc.index("def _top_k_partitions_chi2_dp_multiclass")
ns_mc = {
    "np": np,
    "top_k_partitions": dp.top_k_partitions,
    "splits_to_combination": dp.splits_to_combination,
    "compact_empty_modalities": dp.compact_empty_modalities,
    "combination_formatter": combos.combination_formatter,
    "sort_key": dp.sort_key,
    "_cramerv_tschuprowt": chi2.cramerv_tschuprowt,
    "_chi2_pearson": chi2.pearson_chi2,
}
exec(compile(src_mc[start_mc:], "mc_dp", "exec"), ns_mc)
mc_dp = ns_mc["_top_k_partitions_chi2_dp_multiclass"]

out4 = {}
rng4 = np.random.default_rng(31)
mc_dp_cases = []
for trial in range(6):
    n_mod = int(rng4.integers(3, 11))
    k = int(rng4.integers(2, 6))
    M = rng4.integers(0, 150, size=(n_mod, k)).astype(float)
    if trial % 2 == 1 and n_mod > 3:
        M[int(rng4.integers(0, n_mod))] = 0.0
    labels = [f"m{i:04d}" for i in range(n_mod)]
    for sort_by in ("tschuprowt", "cramerv"):
        res = mc_dp(M, M.sum(axis=1), M.sum(axis=0), max_n_mod=5,
                    raw_index=labels, sort_by=sort_by, top_k=40)
        mc_dp_cases.append({
            "M": M.tolist(), "labels": labels, "max_n_mod": 5, "sort_by": sort_by, "top_k": 40,
            "expected": [{"combination": r["combination"], "cramerv": r["cramerv"],
                          "tschuprowt": r["tschuprowt"]} for r in res],
        })
out4["mc_dp"] = mc_dp_cases

ca_cases = []
for trial in range(16):
    r = int(rng4.integers(1, 9))
    k = int(rng4.integers(1, 6))
    t = rng4.integers(0, 80, size=(r, k)).astype(float)
    if trial % 4 == 0 and r > 2:
        t[int(rng4.integers(0, r))] = 0.0
    xtab = pd.DataFrame(t, index=[f"v{i}" for i in range(r)])
    axis = ca.fit_ca_axis(xtab)
    scores = ca.ca_row_scores(xtab, axis)
    ca_cases.append({
        "table": t.tolist(),
        "col_mass": axis.col_mass.tolist(), "v1": axis.v1.tolist(),
        "degenerate": bool(axis.degenerate),
        "row_scores": scores.tolist(),
    })
out4["ca"] = ca_cases

with open(f"{OUT}/parity_multiclass.json", "w") as f:
    json.dump(out4, f)
print("wrote parity_multiclass.json", {k: len(v) for k, v in out4.items()})

# ---- golden end-to-end dataset + snapshots (round 2) -------------------------
# Recreates tests/properties/test_golden_carving.py:16-44's dataset exactly
# (numpy default_rng(0)) and dumps it as CSV for the Scala suite; the golden
# snapshot JSONs are the reference's own pinned fit outputs (test DATA, not
# code) copied verbatim with provenance.
import shutil

rng_ds = np.random.default_rng(0)
n_rows = 3000
Xg = {
    "num_a": rng_ds.normal(size=n_rows),
    "num_b": rng_ds.gamma(2.0, size=n_rows),
    "cat_a": rng_ds.choice(list("abcdefgh"), size=n_rows),
    "cat_b": rng_ds.choice(["x", "y", "z"], size=n_rows, p=[0.7, 0.2, 0.1]),
}
import pandas as _pd
Xdf = _pd.DataFrame(Xg)
# noise rng is a FRESH default_rng(0) per test run (same for every target)
noise = np.random.default_rng(0).normal(scale=0.5, size=n_rows)
signal = Xdf["num_a"] + 0.5 * Xdf["num_b"] + (Xdf["cat_a"] < "d") * 1.5 + noise
y_binary = (signal > np.median(signal)).astype(int)
y_continuous = signal
y_ordinal = _pd.qcut(signal, 4, labels=[1, 2, 3, 4]).astype(int)
y_multiclass = _pd.qcut(signal, 3, labels=["lo", "mid", "hi"]).astype(str)
golden_df = Xdf.assign(y_binary=y_binary, y_continuous=y_continuous,
                       y_ordinal=y_ordinal, y_multiclass=y_multiclass)
golden_df.to_csv(f"{OUT}/golden_dataset.csv", index=False, float_format="%.17g")
for name in ["BinaryCarver", "ContinuousCarver", "OrdinalCarver", "MulticlassCarver", "OneVsRestCarver"]:
    shutil.copy(f"/root/reference/tests/properties/golden/{name}.json", f"{OUT}/golden_{name}.json")
print("wrote golden_dataset.csv", golden_df.shape, "+ 5 golden snapshots")
