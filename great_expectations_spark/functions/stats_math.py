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
