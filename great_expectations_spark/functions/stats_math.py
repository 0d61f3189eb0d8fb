"""Driver-side statistical math (no scipy in this environment).

Implements the pieces the distributional expectations need:
- KL divergence (scipy.stats.entropy equivalent for pk, qk)
- chi-square survival function via the regularized upper incomplete
  gamma function (Lentz continued fraction + series, standard
  numerical-methods formulation)
- Kolmogorov distribution survival function (asymptotic series)
"""

from __future__ import annotations

import math
from typing import List, Sequence


def kl_divergence(pk: Sequence[float], qk: Sequence[float]) -> float:
    """sum(pk * log(pk/qk)) with 0*log(0)=0; inf when qk=0 < pk."""
    total_p = float(sum(pk))
    total_q = float(sum(qk))
    if total_p <= 0:
        return float("nan")
    acc = 0.0
    for p, q in zip(pk, qk):
        p = p / total_p
        q = q / total_q if total_q > 0 else 0.0
        if p == 0:
            continue
        if q == 0:
            return float("inf")
        acc += p * math.log(p / q)
    return acc


def _gamma_series(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a,x) by series expansion."""
    if x <= 0:
        return 0.0
    ap = a
    summ = 1.0 / a
    delta = summ
    for _ in range(1000):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * 1e-15:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a,x) by continued fraction
    (modified Lentz)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 1000):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def gammainc_upper(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("invalid arguments")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_series(a, x)
    return _gamma_cf(a, x)


def chi2_sf(stat: float, dof: int) -> float:
    """P(X >= stat) for chi-square with ``dof`` degrees of freedom."""
    if stat <= 0:
        return 1.0
    return gammainc_upper(dof / 2.0, stat / 2.0)


def kolmogorov_sf(lam: float) -> float:
    """Q_KS(λ) = 2 Σ_{k≥1} (-1)^{k-1} e^{-2 k² λ²} (asymptotic
    two-sided KS p-value at λ = (sqrt(n)+0.12+0.11/sqrt(n))·D)."""
    if lam <= 0:
        return 1.0
    acc = 0.0
    for k in range(1, 101):
        term = 2.0 * ((-1.0) ** (k - 1)) * math.exp(-2.0 * k * k * lam * lam)
        acc += term
        if abs(term) < 1e-12:
            break
    return min(max(acc, 0.0), 1.0)


def ks_p_value(d_stat: float, n: int) -> float:
    """Asymptotic p-value for a one-sample KS statistic at sample size n."""
    if n <= 0:
        return 1.0
    sqrt_n = math.sqrt(n)
    lam = (sqrt_n + 0.12 + 0.11 / sqrt_n) * d_stat
    return kolmogorov_sf(lam)


def gammainc_lower(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    return 1.0 - gammainc_upper(a, x)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (modified
    Lentz; standard numerical-methods formulation)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
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
        if abs(delta - 1.0) < 1e-15:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def dist_cdf(distribution: str, params: dict, x: float) -> float:
    """CDF of a named parametric distribution (scipy-free subset:
    norm / uniform / expon / lognorm), using scipy's loc/scale
    parameterization so suite kwargs are portable."""
    # accept both scipy names (loc/scale/a/b/s/df) and the reference's
    # dict conventions (dataset/util.py:374-410: mean/std_dev for norm,
    # min/max for uniform — max is the scipy SCALE, i.e. the width —
    # alpha/beta for beta, alpha for gamma)
    loc = float(params.get("loc", 0.0))
    scale = float(params.get("scale", 1.0))
    if distribution == "norm":
        loc = float(params.get("mean", loc))
        scale = float(params.get("std_dev", scale))
    elif distribution == "uniform" and "min" in params:
        loc = float(params["min"])
        scale = float(params.get("max", scale))
    if scale <= 0:
        raise ValueError("scale must be positive")
    if distribution == "norm":
        return 0.5 * (1.0 + math.erf((x - loc) / (scale * math.sqrt(2.0))))
    if distribution == "uniform":
        if x < loc:
            return 0.0
        if x > loc + scale:
            return 1.0
        return (x - loc) / scale
    if distribution == "expon":
        if x < loc:
            return 0.0
        return 1.0 - math.exp(-(x - loc) / scale)
    if distribution == "lognorm":
        s = float(params.get("s", params.get("shape", 1.0)))
        if x <= loc:
            return 0.0
        return 0.5 * (
            1.0 + math.erf(math.log((x - loc) / scale) / (s * math.sqrt(2.0)))
        )
    if distribution == "gamma":
        a = float(params.get("alpha", params.get("a", 1.0)))
        if x <= loc:
            return 0.0
        return gammainc_lower(a, (x - loc) / scale)
    if distribution == "chi2":
        df = float(params.get("df", 1.0))
        if x <= loc:
            return 0.0
        return gammainc_lower(df / 2.0, (x - loc) / (2.0 * scale))
    if distribution == "beta":
        a = float(params.get("alpha", params.get("a", 1.0)))
        b = float(params.get("beta", params.get("b", 1.0)))
        z = (x - loc) / scale
        return betainc_reg(a, b, min(max(z, 0.0), 1.0))
    raise ValueError(
        f"unsupported distribution {distribution!r}; "
        "supported: norm, uniform, expon, lognorm, gamma, chi2, beta"
    )


# scipy positional-args conventions per distribution, so suites may
# pass params as a tuple exactly like scipy.stats.<dist>.cdf
DIST_POSITIONAL = {
    "norm": ["loc", "scale"],
    "uniform": ["loc", "scale"],
    "expon": ["loc", "scale"],
    "lognorm": ["s", "loc", "scale"],
    "gamma": ["a", "loc", "scale"],
    "chi2": ["df", "loc", "scale"],
    "beta": ["a", "b", "loc", "scale"],
}


def cramers_v(
    crosstab: Sequence[Sequence[float]], n: int
) -> "tuple[float, float]":
    """(chi2_stat, Cramér's V) from a contingency table; Yates
    continuity correction applied for 2x2 tables (matching
    scipy.stats.chi2_contingency's default, which the reference uses
    at dataset.py:4432-4441)."""
    rows = len(crosstab)
    cols = len(crosstab[0]) if rows else 0
    if rows < 2 or cols < 2 or n <= 0:
        return 0.0, 0.0
    row_tot = [sum(r) for r in crosstab]
    col_tot = [sum(r[j] for r in crosstab) for j in range(cols)]
    total = float(sum(row_tot)) or 1.0
    yates = rows == 2 and cols == 2
    chi2 = 0.0
    for i in range(rows):
        for j in range(cols):
            e = row_tot[i] * col_tot[j] / total
            if e == 0:
                continue
            diff = abs(crosstab[i][j] - e)
            if yates:
                diff = max(diff - 0.5, 0.0)
            chi2 += diff * diff / e
    v = math.sqrt(chi2 / n / (min(rows, cols) - 1))
    return chi2, max(min(v, 1.0), 0.0)


def psi(pk: Sequence[float], qk: Sequence[float], eps: float = 1e-6) -> float:
    """Population stability index with epsilon smoothing."""
    total_p = float(sum(pk)) or 1.0
    total_q = float(sum(qk)) or 1.0
    acc = 0.0
    for p, q in zip(pk, qk):
        p = max(p / total_p, eps)
        q = max(q / total_q, eps)
        acc += (p - q) * math.log(p / q)
    return acc
