"""Numpy kernels for the tsfresh calculators that aren't relational algebra.

Complements ``catalog/tsfresh_calculators.py`` (the 101 SQL-expressible
calculators): these need FFT / OLS / O(n²) template matching / wavelet
convolution, so they run as vectorized numpy inside Arrow-batched grouped
maps — never per-row Python. Every formula below was pinned EMPIRICALLY
against the reference's tsfresh-0.4.0 golden CSVs on BOTH of its fixture
series (utils/data.json[:60] and the sparse statsd bad_lines day), which
recovered several era-specific quirks a textbook implementation would miss
(asserted by tests/test_tsfresh_golden.py::test_kernel_features_match_golden):

- ``fft_coefficient(x, c)`` is the REAL PART of ``np.fft.rfft(x, 18)[c]``
  — an 18-sample truncation (2·(n_coeffs−1) for the 10-coefficient grid),
  not the full-length transform;
- ``sample_entropy`` is tsfresh's pair-counting form
  ``−ln(#{i<j: |x_i − x_j| < 0.2·σ} / C(n,2))`` — a distance histogram,
  not the Richman-Moorman template ratio;
- ``approximate_entropy(x, m, r)`` tolerances scale by the population σ and
  template distance is Chebyshev with ``<=``;
- ``ar_coefficient(x, k)`` is the conditional-MLE (plain OLS) AR(k) fit
  with intercept first, the statsmodels ``AR(x).fit(maxlag=k)`` layout;
- ``spkt_welch_density`` is a single-segment Welch PSD: periodic Hann,
  constant detrend, density scaling at fs=1;
- ``cwt_coefficients`` convolve with the Ricker wavelet over
  ``min(10·width, n)`` points, mode='same' (the scipy cwt contract);
- ``augmented_dickey_fuller`` is the regression='c' tau statistic with the
  AIC-selected lag — ``operators.stats_math.adfuller`` already matches the
  golden to 1e-11 (it gates ks_test in the engine).

- ``mean_autocorrelation`` divides each lag-k autocovariance sum by the
  LAG k — not the pair count (n−k) its own docstring implies — because the
  historical implementation slices the ``np.correlate`` result one element
  off; that is why golden values exceed 1 (1.1720 on a 60-point series).
  Found by exhaustive search over (index shift × divisor vector ×
  aggregation) after every textbook normalization missed by orders of
  magnitude; the recovered form reproduces BOTH fixture goldens to 1e-13.
"""

from __future__ import annotations

import math

import numpy as np

from .stats_math import adfuller

__all__ = [
    "approximate_entropy",
    "sample_entropy",
    "mean_autocorrelation",
    "ar_coefficient",
    "augmented_dickey_fuller_stat",
    "fft_coefficient",
    "cwt_coefficients",
    "spkt_welch_density",
    "mean_abs_change_quantiles",
    "number_peaks",
    "large_number_of_peaks",
    "number_cwt_peaks",
    "kernel_feature_row",
    "KERNEL_FEATURES",
]


def approximate_entropy(x: np.ndarray, m: int = 2, r: float = 0.3) -> float:
    """ApEn(m, r·σ): |Φ(m) − Φ(m+1)| with Chebyshev ``<=`` template matches."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    tol = r * np.std(x)
    if n <= m + 1:
        return 0.0

    def phi(mm: int) -> float:
        k = n - mm + 1
        xm = np.lib.stride_tricks.sliding_window_view(x, mm)
        c = np.empty(k)
        for i in range(k):
            d = np.max(np.abs(xm - xm[i]), axis=1)
            c[i] = np.count_nonzero(d <= tol) / k
        return float(np.mean(np.log(c)))

    return abs(phi(m) - phi(m + 1))


def sample_entropy(x: np.ndarray) -> float:
    """tsfresh-0.4 form: −ln(#{i<j: |x_i − x_j| < 0.2·σ} / C(n,2))."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    tol = 0.2 * np.std(x)
    s = np.sort(x)
    # two-pointer count of pairs within tol (O(n log n))
    cnt = 0
    j = 0
    for i in range(n):
        while s[i] - s[j] >= tol:
            j += 1
        cnt += i - j
    total = n * (n - 1) // 2
    if cnt == 0 or total == 0:
        return float("nan")
    return -math.log(cnt / total)


def mean_autocorrelation(x: np.ndarray) -> float:
    """tsfresh-0.4 ``mean_autocorrelation``: mean over lags k=1..n−1 of
    ``S_k / (k·σ²)`` where ``S_k = Σ_t (x_t−μ)(x_{t+k}−μ)`` and σ² is the
    population variance. NOTE the divisor is the LAG k, not the pair count
    (n−k) the docstring's estimator formula implies — the historical
    implementation slices ``np.correlate(...,'full')`` one element off, so
    lag k's sum lands on divisor k. This is why golden values can exceed 1
    (1.1720 on the 60-point fixture). Recovered empirically: this exact
    form reproduces BOTH fixture goldens to 1e-13; every textbook
    normalization tried is off by orders of magnitude (see module
    docstring history)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    var = x.var()
    if abs(var) < 1e-10 or n == 1:
        return 0.0
    xc = x - x.mean()
    s = np.correlate(xc, xc, mode="full")[n:]  # S_k for k=1..n−1
    return float(np.mean(s / (np.arange(1, n) * var)))


def ar_coefficient(x: np.ndarray, k: int = 10) -> np.ndarray:
    """AR(k) conditional-MLE fit: OLS of x_t on [1, x_{t−1..t−k}].
    Returns the (k+1)-vector [intercept, φ_1..φ_k]."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n <= k + 1:
        return np.full(k + 1, np.nan)
    y = x[k:]
    cols = [np.ones(n - k)] + [x[k - j : n - j] for j in range(1, k + 1)]
    beta, *_ = np.linalg.lstsq(np.column_stack(cols), y, rcond=None)
    return beta


def augmented_dickey_fuller_stat(x: np.ndarray) -> float:
    """ADF tau statistic, regression='c', AIC lag selection (statsmodels
    default maxlag 12·(n/100)^{1/4})."""
    x = np.asarray(x, dtype=np.float64)
    maxlag = int(np.ceil(12.0 * (x.size / 100.0) ** 0.25))
    return float(adfuller(x, maxlag)[0])


FFT_N_COEFFS = 10


def fft_coefficient(x: np.ndarray, n_coeffs: int = FFT_N_COEFFS) -> np.ndarray:
    """Real parts of ``rfft(x, 2·(n_coeffs−1))`` — the 0.4.0 truncated form."""
    x = np.asarray(x, dtype=np.float64)
    n_fft = 2 * (n_coeffs - 1)
    return np.real(np.fft.rfft(x, n_fft))[:n_coeffs]


def _ricker(points: int, a: float) -> np.ndarray:
    amp = 2.0 / (math.sqrt(3.0 * a) * math.pi**0.25)
    vec = np.arange(points, dtype=np.float64) - (points - 1.0) / 2.0
    return amp * (1.0 - (vec / a) ** 2) * np.exp(-(vec**2) / (2.0 * a * a))


def _cwt(x: np.ndarray, widths) -> np.ndarray:
    """Ricker continuous wavelet transform, one row per width
    (scipy.signal.cwt contract: kernel of min(10·w, n) points, mode='same')."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty((len(widths), x.size))
    for i, w in enumerate(widths):
        pts = min(10 * int(w), x.size)
        out[i] = np.convolve(x, _ricker(pts, w), mode="same")
    return out


CWT_WIDTHS = (2, 5, 10, 20)
CWT_N_COEFFS = 15


def cwt_coefficients(
    x: np.ndarray, widths=CWT_WIDTHS, n_coeffs: int = CWT_N_COEFFS
) -> dict[tuple[int, int], float]:
    """{(width, coeff): value} over the tsfresh default (2,5,10,20) grid."""
    mat = _cwt(x, widths)
    return {
        (int(w), c): float(mat[i, c])
        for i, w in enumerate(widths)
        for c in range(min(n_coeffs, mat.shape[1]))
    }


def spkt_welch_density(x: np.ndarray) -> np.ndarray:
    """Single-segment Welch PSD: periodic Hann window, constant detrend,
    density scaling, fs=1, one-sided."""
    x = np.asarray(x, dtype=np.float64)
    m = x.size
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(m) / m)
    seg = (x - x.mean()) * w
    p = np.abs(np.fft.rfft(seg)) ** 2 / (w * w).sum()
    p[1:-1] *= 2.0
    return p


def mean_abs_change_quantiles(x: np.ndarray, ql: float, qh: float) -> float:
    """Mean |Δx| over steps whose BOTH endpoints lie in the [ql, qh]
    quantile corridor; 0 when the corridor is empty."""
    x = np.asarray(x, dtype=np.float64)
    lo, hi = np.quantile(x, ql), np.quantile(x, qh)
    inside = (x >= lo) & (x <= hi)
    both = inside[:-1] & inside[1:]
    if not both.any():
        return 0.0
    return float(np.abs(np.diff(x))[both].mean())


def number_peaks(x: np.ndarray, support: int) -> int:
    """Points strictly greater than their ``support`` neighbours each side."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n <= 2 * support:
        return 0
    core = x[support : n - support]
    ok = np.ones(core.size, dtype=bool)
    for d in range(1, support + 1):
        ok &= core > x[support - d : n - support - d]
        ok &= core > x[support + d : n - support + d]
    return int(ok.sum())


def large_number_of_peaks(x: np.ndarray, support: int) -> bool:
    """tsfresh: number_peaks(x, n) > 5."""
    return number_peaks(x, support) > 5


def number_cwt_peaks(x: np.ndarray, max_width: int) -> int:
    """scipy.signal.find_peaks_cwt(x, arange(1, max_width+1)) peak count —
    ridge-line identification + SNR filtering (the public scipy algorithm)."""
    x = np.asarray(x, dtype=np.float64)
    widths = np.arange(1, max_width + 1)
    mat = _cwt(x, widths)
    gap_thresh = math.ceil(widths[0])
    max_distances = widths / 4.0

    # relative maxima per row (order-1, clip mode)
    n_rows, n_cols = mat.shape
    relmax = np.zeros_like(mat, dtype=bool)
    for r in range(n_rows):
        row = mat[r]
        left = np.roll(row, 1)
        left[0] = row[0]
        right = np.roll(row, -1)
        right[-1] = row[-1]
        relmax[r] = (row > left) & (row > right)

    has = np.where(relmax.any(axis=1))[0]
    if has.size == 0:
        return 0
    start_row = has[-1]
    ridge_lines = [[[start_row], [c], 0] for c in np.where(relmax[start_row])[0]]
    final_lines = []
    for row in range(start_row - 1, -1, -1):
        this_cols = np.where(relmax[row])[0]
        for line in ridge_lines:
            line[2] += 1
        prev_cols = np.array([line[1][-1] for line in ridge_lines])
        for col in this_cols:
            line = None
            if prev_cols.size:
                diffs = np.abs(col - prev_cols)
                closest = int(np.argmin(diffs))
                if diffs[closest] <= max_distances[row]:
                    line = ridge_lines[closest]
            if line is not None:
                line[0].append(row)
                line[1].append(col)
                line[2] = 0
            else:
                ridge_lines.append([[row], [col], 0])
        keep = []
        for line in ridge_lines:
            if line[2] > gap_thresh:
                final_lines.append(line)
            else:
                keep.append(line)
        ridge_lines = keep

    all_lines = final_lines + ridge_lines
    # filter: min_length = ceil(n_rows/4); SNR vs the 10th percentile of the
    # smallest-width row over a ±(n/20)/2 window
    min_length = math.ceil(n_rows / 4.0)
    window_size = math.ceil(n_cols / 20.0)
    hf = int(window_size // 2)
    row_one = mat[0]
    count = 0
    for line in all_lines:
        order = np.argsort(line[0])
        rows_s = [line[0][i] for i in order]
        cols_s = [line[1][i] for i in order]
        if len(rows_s) < min_length:
            continue
        c0 = cols_s[0]
        # noise window includes the +hf endpoint — pinned against the golden
        # peak counts (9, 6) on the reference fixture
        lo = max(c0 - hf, 0)
        hi = min(c0 + hf + 1, n_cols)
        noise = np.percentile(row_one[lo:hi], 10)
        if noise == 0:
            continue
        snr = abs(mat[rows_s[0], cols_s[0]] / noise)
        if snr >= 1:
            count += 1
    return count


# ---------------------------------------------------------------------------
# assembled kernel feature row (for the grouped-map catalog query)
# ---------------------------------------------------------------------------

APEN_RS = (0.1, 0.3, 0.5, 0.7, 0.9)
AR_K = 10
AR_COEFFS = (0, 1, 2, 3, 4)
FFT_COEFFS = tuple(range(10))
WELCH_COEFFS = (2, 5, 8)
# the FULL tsfresh-0.4.0 default grids — every (param, value) the reference's
# golden CSV pins is emitted by the engine (tests/test_tsfresh_golden.py
# asserts full-matrix coverage)
CWT_KEYS = tuple((w, c) for w in CWT_WIDTHS for c in range(CWT_N_COEFFS))
MACQ_QS = tuple(
    (ql, qh)
    for qh in (0.2, 0.4, 0.6, 0.8, 1.0)
    for ql in (0.0, 0.2, 0.4, 0.6, 0.8)
)
PEAK_NS = (1, 3, 5)


def _pname(v: float) -> str:
    """Canonical float fragment for a feature-column name (0.05 → '0_05',
    1.0 → '1', -1 → 'm1') — MUST stay identical to
    catalog/tsfresh_calculators._p (operators/ cannot import from catalog/,
    so the one-liner is mirrored; tests/test_tsfresh_golden.py's key mapper
    canonicalizes with the same scheme and would catch a drift)."""
    return f"{round(v, 2):g}".replace(".", "_").replace("-", "m")


def _kernel_feature_names() -> list[str]:
    names = [f"approximate_entropy_m_2_r_{_pname(r)}" for r in APEN_RS]
    names.append("sample_entropy")
    names.append("mean_autocorrelation")
    names += [f"ar_coefficient_k_{AR_K}_coeff_{c}" for c in AR_COEFFS]
    names.append("augmented_dickey_fuller")
    names += [f"fft_coefficient_coeff_{c}" for c in FFT_COEFFS]
    names += [f"spkt_welch_density_coeff_{c}" for c in WELCH_COEFFS]
    names += [f"cwt_coefficients_w_{w}_coeff_{c}" for w, c in CWT_KEYS]
    names += [
        f"mean_abs_change_quantiles_ql_{_pname(ql)}_qh_{_pname(qh)}"
        for ql, qh in MACQ_QS
    ]
    names += [f"number_cwt_peaks_n_{n}" for n in PEAK_NS]
    names += [f"large_number_of_peaks_n_{n}" for n in PEAK_NS]
    return names


KERNEL_FEATURES = _kernel_feature_names()


def kernel_feature_row(x: np.ndarray) -> list[float]:
    """All kernel features of one series, in KERNEL_FEATURES order."""
    vals: list[float] = [approximate_entropy(x, 2, r) for r in APEN_RS]
    vals.append(sample_entropy(x))
    vals.append(mean_autocorrelation(x))
    ar = ar_coefficient(x, AR_K)
    vals += [float(ar[c]) for c in AR_COEFFS]
    vals.append(augmented_dickey_fuller_stat(x))
    fft = fft_coefficient(x)
    vals += [float(fft[c]) for c in FFT_COEFFS]
    wel = spkt_welch_density(x)
    vals += [float(wel[c]) if c < wel.size else float("nan") for c in WELCH_COEFFS]
    cwt_map = cwt_coefficients(x)
    vals += [cwt_map.get((w, c), float("nan")) for w, c in CWT_KEYS]
    vals += [mean_abs_change_quantiles(x, ql, qh) for ql, qh in MACQ_QS]
    vals += [float(number_cwt_peaks(x, n)) for n in PEAK_NS]
    vals += [1.0 if large_number_of_peaks(x, n) else 0.0 for n in PEAK_NS]
    return vals
