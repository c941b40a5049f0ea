"""Pure numpy/python stand-ins for the scipy/sklearn surface the reference
imports, precise enough for statistic-level parity (p-values included via
incomplete gamma/beta where cheap). Install with `install()` BEFORE importing
AutoCarver. Used only to EXECUTE the reference for fixture generation — never
shipped in the engine."""
import math
import sys
import types

import numpy as np


# ---------------------------------------------------------------- normal dist
def _norm_ppf(p):
    """Acklam's rational approximation + one Halley refinement with erfc —
    accurate to ~1e-15 (matches scipy to the last ulp in practice)."""
    p = float(p)
    if not (0.0 < p < 1.0):
        return math.nan if not (p == 0.0 or p == 1.0) else (-math.inf if p == 0.0 else math.inf)
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow = 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        x = (((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    elif p <= 1 - plow:
        q = p - 0.5
        r = q*q
        x = (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*q / (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)
    else:
        q = math.sqrt(-2 * math.log(1 - p))
        x = -(((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    # Halley refinement
    e = 0.5 * math.erfc(-x / math.sqrt(2)) - p
    u = e * math.sqrt(2 * math.pi) * math.exp(x * x / 2)
    x = x - u / (1 + x * u / 2)
    return x


def _norm_sf(x):
    x = np.asarray(x, dtype=float)
    out = 0.5 * np.vectorize(math.erfc)(x / math.sqrt(2))
    return out if out.shape else float(out)


def _norm_cdf(x):
    x = np.asarray(x, dtype=float)
    out = 0.5 * np.vectorize(math.erfc)(-x / math.sqrt(2))
    return out if out.shape else float(out)


# ------------------------------------------------- incomplete gamma (chi2 sf)
def _gammainc_upper_q(a, x):
    """Regularized upper incomplete gamma Q(a, x) (NR gser/gcf)."""
    if x < 0 or a <= 0:
        return math.nan
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # series for P, return 1-P
        ap = a
        s = 1.0 / a
        delta = s
        for _ in range(10000):
            ap += 1.0
            delta *= x / ap
            s += delta
            if abs(delta) < abs(s) * 1e-16:
                break
        return 1.0 - s * math.exp(-x + a * math.log(x) - math.lgamma(a))
    # continued fraction for Q
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 10000):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny: d = tiny
        c = b + an / c
        if abs(c) < tiny: c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < 1e-16:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _chi2_sf(x, df):
    return _gammainc_upper_q(df / 2.0, x / 2.0)


# ------------------------------------------------------------------ chi2 test
def _chi2_contingency(observed, correction=True, lambda_=None):
    obs = np.asarray(observed, dtype=float)
    if obs.size == 0 or obs.sum() == 0:
        raise ValueError("zero table")
    rowsums = obs.sum(axis=1, keepdims=True)
    colsums = obs.sum(axis=0, keepdims=True)
    expected = rowsums * colsums / obs.sum()
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    if dof == 0:
        return (0.0, 1.0, 0, expected)
    work = obs
    if correction and dof == 1:
        # scipy: shift each cell 0.5 toward its expected value
        diff = expected - work
        direction = np.sign(diff)
        magnitude = np.minimum(0.5, np.abs(diff))
        work = work + magnitude * direction
    terms = (work - expected) ** 2 / expected
    stat = float(terms.sum())
    p = _chi2_sf(stat, dof)
    return (stat, p, dof, expected)


# ------------------------------------------------------------------- rankdata
def _rankdata(a, method="average"):
    a = np.asarray(a, dtype=float)
    sorter = np.argsort(a, kind="mergesort")
    inv = np.empty(len(a), dtype=np.intp)
    inv[sorter] = np.arange(len(a))
    s = a[sorter]
    obs = np.r_[True, s[1:] != s[:-1]]
    dense = obs.cumsum()[inv]
    counts = np.r_[np.nonzero(obs)[0], len(obs)]
    if method == "average":
        return 0.5 * (counts[dense] + counts[dense - 1] + 1)
    raise NotImplementedError(method)


def _tiecorrect(ranks):
    arr = np.sort(np.asarray(ranks))
    idx = np.nonzero(np.r_[True, arr[1:] != arr[:-1], True])[0]
    cnt = np.diff(idx).astype(np.float64)
    size = np.float64(arr.size)
    return 1.0 if size < 2 else 1.0 - (cnt ** 3 - cnt).sum() / (size ** 3 - size)


def _kruskal(*groups):
    groups = [np.asarray(g, dtype=float) for g in groups]
    n = np.asarray([len(g) for g in groups])
    if np.any(n == 0):
        raise ValueError("empty group")
    alldata = np.concatenate(groups)
    ranked = _rankdata(alldata)
    ties = _tiecorrect(ranked)
    if ties == 0:
        raise ValueError("all numbers identical")
    j = np.insert(np.cumsum(n), 0, 0)
    ssbn = 0.0
    ntot = len(alldata)
    for i in range(len(groups)):
        ssbn += ranked[j[i]:j[i+1]].sum() ** 2 / n[i]
    h = 12.0 / (ntot * (ntot + 1)) * ssbn - 3 * (ntot + 1)
    df = len(groups) - 1
    h /= ties
    return (h, _chi2_sf(h, df))


# --------------------------------------------------- incomplete beta (t / r p)
def _betacf(a, b, x):
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny: d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 10000):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny: d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny: c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny: d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny: c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < 1e-16:
            break
    return h


def _betainc(a, b, x):
    if x <= 0: return 0.0
    if x >= 1: return 1.0
    ln = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b) + a * math.log(x) + b * math.log(1 - x)
    front = math.exp(ln)
    if x < (a + 1) / (a + b + 2):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1 - x) / b


def _t_sf(x, df):
    xa = np.asarray(x, dtype=float)
    dfa = np.broadcast_to(np.asarray(df, dtype=float), xa.shape) if xa.shape else np.asarray(df, dtype=float)

    def one(xx, dd):
        if math.isnan(xx) or math.isnan(dd):
            return math.nan
        p = 0.5 * _betainc(dd / 2.0, 0.5, dd / (dd + xx * xx))
        return p if xx >= 0 else 1.0 - p
    if xa.shape:
        return np.array([one(xx, dd) for xx, dd in zip(xa.ravel(), dfa.ravel())]).reshape(xa.shape)
    return one(float(xa), float(dfa))


def _pearsonr(x, y):
    x = np.asarray(x, dtype=float); y = np.asarray(y, dtype=float)
    n = len(x)
    xm, ym = x - x.mean(), y - y.mean()
    r = float((xm * ym).sum() / math.sqrt((xm * xm).sum() * (ym * ym).sum()))
    r = max(-1.0, min(1.0, r))
    if n <= 2 or abs(r) == 1.0:
        p = 0.0
    else:
        tstat = r * math.sqrt((n - 2) / (1 - r * r))
        p = 2 * _t_sf(abs(tstat), n - 2)

    class _R(tuple):
        @property
        def statistic(self): return self[0]
        @property
        def pvalue(self): return self[1]
    return _R((r, p))


def _spearmanr(x, y):
    rx, ry = _rankdata(x), _rankdata(y)
    return _pearsonr(rx, ry)


def _corr_distance(u, v):
    u = np.asarray(u, dtype=float); v = np.asarray(v, dtype=float)
    um, vm = u - u.mean(), v - v.mean()
    return 1.0 - float((um * vm).sum() / math.sqrt((um * um).sum() * (vm * vm).sum()))


# -------------------------------------------------------------------- install
def install():
    if "scipy" in sys.modules and getattr(sys.modules["scipy"], "__scishim__", False) is False:
        return  # real scipy present

    class _Frozen:
        pass

    norm = _Frozen(); norm.ppf = _norm_ppf; norm.sf = _norm_sf; norm.cdf = _norm_cdf
    tdist = _Frozen(); tdist.sf = _t_sf

    scipy = types.ModuleType("scipy"); scipy.__scishim__ = True
    stats = types.ModuleType("scipy.stats")
    stats.norm = norm
    stats.t = tdist
    stats.chi2_contingency = _chi2_contingency
    stats.kruskal = _kruskal
    stats.rankdata = _rankdata
    stats.tiecorrect = _tiecorrect
    stats.pearsonr = _pearsonr
    stats.spearmanr = _spearmanr
    spatial = types.ModuleType("scipy.spatial")
    distance = types.ModuleType("scipy.spatial.distance")
    distance.correlation = _corr_distance
    spatial.distance = distance
    scipy.stats = stats
    scipy.spatial = spatial
    sys.modules["scipy"] = scipy
    sys.modules["scipy.stats"] = stats
    sys.modules["scipy.spatial"] = spatial
    sys.modules["scipy.spatial.distance"] = distance

    sklearn = types.ModuleType("sklearn")
    base = types.ModuleType("sklearn.base")

    class BaseEstimator:
        pass

    class TransformerMixin:
        def fit_transform(self, X=None, y=None, **kw):
            self.fit(X, y, **kw)
            return self.transform(X)

    base.BaseEstimator = BaseEstimator
    base.TransformerMixin = TransformerMixin
    msel = types.ModuleType("sklearn.model_selection")

    class BaseCrossValidator:
        pass

    def check_cv(cv=5, y=None, classifier=False):
        # sklearn semantics for the cases fixture generation needs: a
        # cross-validator passes through; an iterable of (train_idx,
        # test_idx) pairs is wrapped as-is (sklearn's _CVIterableWrapper).
        # Integer cv (KFold/StratifiedKFold construction) is NOT re-derived
        # here -- a subtly-off stratification would silently corrupt
        # fixtures; pass explicit index pairs instead.
        if isinstance(cv, BaseCrossValidator) or hasattr(cv, "split"):
            return cv
        if isinstance(cv, int):
            raise NotImplementedError(
                "scishim: integer cv not supported; pass an iterable of (train_idx, test_idx) pairs")
        pairs = [(np.asarray(a), np.asarray(b)) for a, b in cv]

        class _CVIterableWrapper(BaseCrossValidator):
            def split(self, X=None, y=None, groups=None):
                for train, test in pairs:
                    yield train, test

            def get_n_splits(self, X=None, y=None, groups=None):
                return len(pairs)

        return _CVIterableWrapper()

    msel.BaseCrossValidator = BaseCrossValidator
    msel.check_cv = check_cv
    util = types.ModuleType("sklearn.utils")
    validation = types.ModuleType("sklearn.utils.validation")

    def check_is_fitted(est, attributes=None):
        return None

    validation.check_is_fitted = check_is_fitted
    util.validation = validation
    sklearn.base = base
    sklearn.model_selection = msel
    sklearn.utils = util
    sys.modules["sklearn"] = sklearn
    sys.modules["sklearn.base"] = base
    sys.modules["sklearn.model_selection"] = msel
    sys.modules["sklearn.utils"] = util
    sys.modules["sklearn.utils.validation"] = validation
