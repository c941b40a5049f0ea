"""Import the reference AutoCarver with scipy/sklearn/tqdm/statsmodels
shimmed (fixture generation only). `load()` returns the package."""
import sys, types

def load():
    sys.path.insert(0, '/root/repo/tools')
    import scishim
    scishim.install()
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm"); tqa = types.ModuleType("tqdm.auto")
        def tqdm(it=None, **kw):
            return it if it is not None else (lambda x: x)
        tqa.tqdm = tqdm; tq.auto = tqa; tq.tqdm = tqdm
        sys.modules["tqdm"] = tq; sys.modules["tqdm.auto"] = tqa
    if "statsmodels" not in sys.modules:
        sm = types.ModuleType("statsmodels")
        smf = types.ModuleType("statsmodels.formula")
        smfa = types.ModuleType("statsmodels.formula.api")
        smapi = types.ModuleType("statsmodels.api")
        def ols(*a, **k):
            raise NotImplementedError("scishim: ols not supported")
        smfa.ols = ols
        smapi.stats = types.SimpleNamespace(anova_lm=None)
        sm.formula = smf; smf.api = smfa; sm.api = smapi
        for n, m in [("statsmodels", sm), ("statsmodels.formula", smf),
                     ("statsmodels.formula.api", smfa), ("statsmodels.api", smapi)]:
            sys.modules[n] = m
    sys.path.insert(0, '/root/reference')
    import AutoCarver
    return AutoCarver
