#!/usr/bin/env python3
"""Pin reference BEHAVIORS (not values) the engine's typed errors depend on,
by EXECUTING the reference and recording the outcome into a test resource.

Currently pinned:
 - nested_multiclass: a nested feature under an unordered (string)
   multiclass target crashes inside the reference's target sort
   (`discretizers/qualitatives/nested_discretizer.py` via
   `series_target_rate` mean over object dtype). The engine raises a typed
   error with that rationale (MulticlassCarver.scala) — if a future
   reference release fixes the crash, regenerating this pin flips the flag
   and NestedSpec fails, forcing the engine to follow.
"""
import json
import sys

sys.path.insert(0, '/root/repo/tools')
import refload

AC = refload.load()
from AutoCarver.features import Features
import pandas as pd

OUT = "/root/repo/src/test/resources/graft/ref_pins.json"

pins = {}

df = pd.DataFrame({
    "fine": [f"s{i%4}_l{i%3}" for i in range(300)],
    "coarse": [f"s{i%4}" for i in range(300)],
})
y = pd.Series([["low", "mid", "high"][i % 3] for i in range(300)])
mc = AC.MulticlassCarver(Features(nested={"fine": ["coarse"]}),
                         min_freq=0.05, max_n_mod=4)
try:
    mc.fit(df.copy(), y)
    pins["nested_multiclass"] = {"raises": False, "error": None}
except Exception as e:  # noqa: BLE001 - the exception IS the pinned behavior
    pins["nested_multiclass"] = {
        "raises": True,
        "error": f"{type(e).__name__}: {str(e)[:200]}",
    }

import os
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    json.dump(pins, f, indent=2)
print("wrote", OUT, json.dumps(pins))
