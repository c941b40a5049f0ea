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
