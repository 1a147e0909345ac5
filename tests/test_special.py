"""Independent verification of the tail-probability special functions.

Each survival function is checked against brute-force numerical
integration of the corresponding probability density (Simpson's rule on
a fine grid) — an implementation path that shares no code with
core/special.py.
"""

from __future__ import annotations

import math

import pytest

from tableone_pyspark_spark.core import special


def simpson(f, a, b, n=20001):
    if n % 2 == 0:
        n += 1
    h = (b - a) / (n - 1)
    s = f(a) + f(b)
    for i in range(1, n - 1):
        s += f(a + i * h) * (4 if i % 2 else 2)
    return s * h / 3.0


def t_pdf(x, dof):
    c = math.gamma((dof + 1) / 2) / (math.sqrt(dof * math.pi) * math.gamma(dof / 2))
    return c * (1 + x * x / dof) ** (-(dof + 1) / 2)


def f_pdf(x, d1, d2):
    if x <= 0:
        return 0.0
    num = (d1 * x) ** d1 * d2**d2 / (d1 * x + d2) ** (d1 + d2)
    beta = math.gamma(d1 / 2) * math.gamma(d2 / 2) / math.gamma((d1 + d2) / 2)
    return math.sqrt(num) / (x * beta)


def chi2_pdf(x, k):
    if x <= 0:
        return 0.0
    return x ** (k / 2 - 1) * math.exp(-x / 2) / (2 ** (k / 2) * math.gamma(k / 2))


@pytest.mark.parametrize("t,dof", [(1.357, 4), (2.0, 10), (3.5, 30), (0.1, 100)])
def test_t_sf(t, dof):
    # two-sided tail = 2 * ∫_t^∞ pdf; integrate to a far cutoff
    # (dof >= 4 only: the tail beyond the cutoff is negligible there)
    hi = t + 400.0 / math.sqrt(dof)
    expect = 2.0 * simpson(lambda x: t_pdf(x, dof), t, hi, 40001)
    got = special.t_sf_two_sided(t, dof)
    assert math.isclose(got, expect, rel_tol=1e-6), (got, expect)


@pytest.mark.parametrize("t", [0.25, 0.5, 1.0, 2.5, 10.0])
def test_t_sf_closed_forms(t):
    # dof=1 is Cauchy: two-sided sf = 1 - 2*arctan(t)/π
    assert math.isclose(
        special.t_sf_two_sided(t, 1), 1.0 - 2.0 * math.atan(t) / math.pi, rel_tol=1e-12
    )
    # dof=2: two-sided sf = 1 - t/sqrt(2 + t²)
    assert math.isclose(
        special.t_sf_two_sided(t, 2), 1.0 - t / math.sqrt(2.0 + t * t), rel_tol=1e-12
    )


@pytest.mark.parametrize("f,d1,d2", [(1.0, 3, 8), (2.5, 2, 10), (5.0, 4, 4), (0.3, 6, 20)])
def test_f_sf(f, d1, d2):
    expect = 1.0 - simpson(lambda x: f_pdf(x, d1, d2), 1e-12, f, 40001)
    got = special.f_sf(f, d1, d2)
    assert math.isclose(got, expect, rel_tol=1e-6, abs_tol=1e-9), (got, expect)


@pytest.mark.parametrize("x,k", [(10.0, 5), (30.0, 20), (4.0, 4)])
def test_chi2_sf(x, k):
    # k >= 3 only: the k=1 density is singular at 0 and breaks Simpson
    expect = 1.0 - simpson(lambda v: chi2_pdf(v, k), 1e-12, x, 40001)
    got = special.chi2_sf(x, k)
    assert math.isclose(got, expect, rel_tol=1e-6, abs_tol=1e-9), (got, expect)


@pytest.mark.parametrize("x", [0.5, 1.0, 3.84, 10.0])
def test_chi2_sf_closed_forms(x):
    # k=1: sf = erfc(sqrt(x/2));  k=2: sf = exp(-x/2)
    assert math.isclose(special.chi2_sf(x, 1), math.erfc(math.sqrt(x / 2)), rel_tol=1e-12)
    assert math.isclose(special.chi2_sf(x, 2), math.exp(-x / 2), rel_tol=1e-12)


def test_known_critical_values():
    # classic table values: chi2(1) at 3.841 → p=0.05; t(∞→large) 1.96 → 0.05
    assert math.isclose(special.chi2_sf(3.841458820694124, 1), 0.05, rel_tol=1e-9)
    assert math.isclose(special.t_sf_two_sided(1.959963984540054, 10**7), 0.05, rel_tol=1e-4)
    assert special.chi2_sf(0.0, 3) == 1.0
    assert special.f_sf(0.0, 2, 2) == 1.0
    assert math.isnan(special.t_sf_two_sided(float("nan"), 5))
