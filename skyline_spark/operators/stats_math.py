"""Pure-numpy statistical primitives.

scipy / statsmodels are not available in the runtime, so the three
special-function dependencies of the reference's detector kernels
(reference: /root/reference/skyline/analyzer/algorithms.py) are
implemented here from standard published formulas:

- ``t_isf(q, df)``       — Student-t inverse survival function, used by the
  Grubbs detector (`analyzer/algorithms.py:163` calls ``scipy.stats.t.isf``).
  Computed by bisection on the t survival function, which is expressed via the
  regularized incomplete beta function (continued-fraction evaluation, the
  classic Lentz/Numerical-Recipes ``betacf`` scheme).
- ``ks_2samp(a, b)``     — two-sample Kolmogorov–Smirnov D statistic + the
  asymptotic (Smirnov) p-value used by the ks_test detector
  (`analyzer/algorithms.py:387`).
- ``adfuller(x, maxlag)`` — Augmented Dickey-Fuller test (constant-only
  regression, AIC lag selection) with MacKinnon (1994) approximate p-values,
  used as the stationarity gate in ks_test (`analyzer/algorithms.py:390`).

All functions are deterministic and operate on plain numpy arrays so they are
safe inside Arrow-batched pandas UDFs (no per-row Python in the Spark plan —
these run once per *group*, not per row).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "betainc",
    "t_sf",
    "t_isf",
    "norm_cdf",
    "kolmogorov_sf",
    "kolmogorov_isf",
    "ks_2samp",
    "mackinnon_pvalue",
    "mackinnon_tau_crit",
    "adfuller",
]


# ---------------------------------------------------------------------------
# Regularized incomplete beta  I_x(a, b)
# ---------------------------------------------------------------------------

def _betacf(a: float, b: float, x: float, max_iter: int = 300, eps: float = 3e-14) -> float:
    """Continued-fraction for the incomplete beta (modified Lentz method)."""
    tiny = 1e-300
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta function I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


# ---------------------------------------------------------------------------
# Student t
# ---------------------------------------------------------------------------

def t_sf(t: float, df: float) -> float:
    """Student-t survival function P(T > t)."""
    if df <= 0:
        return float("nan")
    if t == 0.0:
        return 0.5
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return p if t > 0 else 1.0 - p


import functools


@functools.lru_cache(maxsize=65536)
def t_isf(q: float, df: float) -> float:
    """Student-t inverse survival function (matches scipy.stats.t.isf).

    Bisection on ``t_sf``; ~1e-12 relative accuracy, plenty for the Grubbs
    threshold where q = 0.05 / (2N).
    """
    if not (0.0 < q < 1.0):
        return float("inf") if q <= 0 else float("-inf")
    if df <= 0:
        return float("nan")
    if q == 0.5:
        return 0.0
    if q > 0.5:
        return -t_isf(1.0 - q, df)
    lo, hi = 0.0, 2.0
    while t_sf(hi, df) > q:
        hi *= 2.0
        if hi > 1e12:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_sf(mid, df) > q:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-13 * max(1.0, lo):
            break
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# Normal CDF (for MacKinnon p-values)
# ---------------------------------------------------------------------------

def norm_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov
# ---------------------------------------------------------------------------

def kolmogorov_sf(x: float, terms: int = 101) -> float:
    """Survival function of the Kolmogorov distribution.

    Q(x) = 2 * sum_{k>=1} (-1)^(k-1) exp(-2 k^2 x^2)  (alternating Smirnov
    series). Clipped to [0, 1].
    """
    if x <= 0.0:
        return 1.0
    total = 0.0
    for k in range(1, terms):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * x * x)
        total += term
        if abs(term) < 1e-16:
            break
    return min(1.0, max(0.0, total))


@functools.lru_cache(maxsize=64)
def kolmogorov_isf(q: float) -> float:
    """Inverse survival function of the Kolmogorov distribution.

    Returns λ with ``kolmogorov_sf(λ) = q`` (bisection on the monotone
    Smirnov series). ``kolmogorov_isf(0.05)`` is the asymptotic two-sample
    .05 critical line: p < .05  ⇔  √(n·m/(n+m))·D > λ — the closed form the
    SQL oracles compare against (the kernel computes the p-value itself)."""
    if not (0.0 < q < 1.0):
        raise ValueError("q must be in (0, 1)")
    lo, hi = 1e-9, 10.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if kolmogorov_sf(mid) > q:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-13:
            break
    return 0.5 * (lo + hi)


def ks_2samp(data1: np.ndarray, data2: np.ndarray) -> tuple[float, float]:
    """Two-sample KS test: (D, asymptotic p-value).

    D is exact; the p-value uses the asymptotic Kolmogorov distribution with
    effective sample size en = n*m/(n+m) (same as scipy's ``mode='asymp'``).
    The reference gates on ``p < .05 and D > .5`` (`analyzer/algorithms.py:389`)
    so the asymptotic approximation only matters at the decision boundary.
    """
    d1 = np.sort(np.asarray(data1, dtype=np.float64))
    d2 = np.sort(np.asarray(data2, dtype=np.float64))
    n1, n2 = d1.size, d2.size
    if n1 == 0 or n2 == 0:
        return float("nan"), float("nan")
    data_all = np.concatenate([d1, d2])
    cdf1 = np.searchsorted(d1, data_all, side="right") / n1
    cdf2 = np.searchsorted(d2, data_all, side="right") / n2
    d = float(np.max(np.abs(cdf1 - cdf2)))
    en = n1 * n2 / (n1 + n2)
    p = kolmogorov_sf(math.sqrt(en) * d)
    return d, p


# ---------------------------------------------------------------------------
# Augmented Dickey-Fuller (constant-only, AIC lag selection)
# ---------------------------------------------------------------------------

# MacKinnon (1994, 2010) approximate-p-value response-surface coefficients for
# the constant-only ('c') Dickey-Fuller tau distribution, N=1. Published
# tables (also carried in statsmodels.tsa.adfvalues under BSD).
_TAU_MAX_C = 2.74
_TAU_MIN_C = -18.83
_TAU_STAR_C = -1.61
_TAU_C_SMALLP = (2.1659, 1.4412, 0.038269)
_TAU_C_LARGEP = (1.7339, 0.93202, -0.12745, -0.010368)


def mackinnon_pvalue(tau: float) -> float:
    """MacKinnon approximate p-value for ADF tau stat, regression='c'."""
    if tau > _TAU_MAX_C:
        return 1.0
    if tau < _TAU_MIN_C:
        return 0.0
    coeffs = _TAU_C_SMALLP if tau <= _TAU_STAR_C else _TAU_C_LARGEP
    val = 0.0
    for c in reversed(coeffs):
        val = val * tau + c
    return norm_cdf(val)


@functools.lru_cache(maxsize=64)
def mackinnon_tau_crit(q: float) -> float:
    """τ with ``mackinnon_pvalue(τ) = q`` (bisection; the response surface is
    monotone increasing in τ). ``mackinnon_tau_crit(0.05)`` is the constant
    ADF gate line: p < .05  ⇔  τ < this value — our mackinnon_pvalue carries
    no sample-size term, so the line is a single literal the SQL oracles can
    embed."""
    if not (0.0 < q < 1.0):
        raise ValueError("q must be in (0, 1)")
    lo, hi = _TAU_MIN_C, _TAU_MAX_C
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if mackinnon_pvalue(mid) < q:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-13:
            break
    return 0.5 * (lo + hi)


def _ols(y: np.ndarray, X: np.ndarray) -> tuple[np.ndarray, float, np.ndarray]:
    """OLS fit: returns (beta, ssr, se(beta))."""
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    n, k = X.shape
    dof = max(n - k, 1)
    sigma2 = ssr / dof
    xtx_inv = np.linalg.pinv(X.T @ X)
    se = np.sqrt(np.maximum(np.diag(xtx_inv) * sigma2, 0.0))
    return beta, ssr, se


def adfuller(x: np.ndarray, maxlag: int = 10) -> tuple[float, float, int]:
    """ADF unit-root test, regression='c', lag chosen by AIC over 0..maxlag.

    Returns ``(tau_stat, pvalue, usedlag)``. Mirrors the call shape of
    ``statsmodels.tsa.stattools.adfuller(x, 10)`` used by the reference
    (`analyzer/algorithms.py:390` — only ``adf[1]`` i.e. the p-value is
    consumed, gated at < .05).
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    # need enough observations: diff loses 1, lags lose maxlag, + 2 params
    maxlag = int(min(maxlag, max(0, (n - 1) // 2 - 2)))
    dx = np.diff(x)
    ylag = x[:-1]

    def build(k: int, start: int) -> tuple[np.ndarray, np.ndarray]:
        # regress dx[t] on [y[t-1], dx[t-1..t-k], 1] for t in [start, len(dx))
        rows = len(dx) - start
        cols = [ylag[start:]]
        for j in range(1, k + 1):
            cols.append(dx[start - j : len(dx) - j])
        cols.append(np.ones(rows))
        return dx[start:], np.column_stack(cols)

    # AIC over a common sample (statsmodels-style: start at maxlag)
    best_k, best_aic = 0, float("inf")
    for k in range(0, maxlag + 1):
        y, X = build(k, maxlag)
        if y.size <= X.shape[1]:
            continue
        _, ssr, _ = _ols(y, X)
        nobs = y.size
        if ssr <= 0:
            aic = float("-inf")
        else:
            aic = nobs * math.log(ssr / nobs) + 2 * (k + 2)
        if aic < best_aic:
            best_aic, best_k = aic, k
    # refit at the chosen lag using all available observations
    y, X = build(best_k, best_k)
    beta, ssr, se = _ols(y, X)
    tau = float(beta[0] / se[0]) if se[0] > 0 else float("-inf")
    return tau, mackinnon_pvalue(tau), best_k
