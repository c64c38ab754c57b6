"""Statistics helpers (reference stdstat.c)."""

from __future__ import annotations

import ctypes
import ctypes.util
import math

# CPython's math.erf is its own implementation and differs from glibc's in
# the last ulps; the reference links libm, so route erf through it.
def _load_libm():
    try:
        return ctypes.CDLL("libm.so.6")
    except OSError:  # pragma: no cover - non-glibc platforms
        name = ctypes.util.find_library("m")
        if name:
            try:
                return ctypes.CDLL(name)
            except OSError:
                pass
    return None


_libm = _load_libm()
if _libm is not None:
    _libm.erf.restype = ctypes.c_double
    _libm.erf.argtypes = [ctypes.c_double]
    _libm.tgamma.restype = ctypes.c_double
    _libm.tgamma.argtypes = [ctypes.c_double]

    def _erf(x: float) -> float:
        return _libm.erf(x)

    _TGAMMA_HALF = _libm.tgamma(0.5)
else:  # pragma: no cover - last-ulp p-value parity is not guaranteed
    import sys
    print("# kma_tpu: libm not found; falling back to math.erf "
          "(last-ulp p-value parity with the reference may be lost)",
          file=sys.stderr)
    _erf = math.erf
    _TGAMMA_HALF = math.gamma(0.5)

# fastp lookup table (stdstat.c:37-134): p-value from chi-square quantile
_FASTP_TABLE = [
    (114.5242, 1e-26), (109.9604, 1e-25), (105.3969, 1e-24), (100.8337, 1e-23),
    (96.27476, 1e-22), (91.71701, 1e-21), (87.16164, 1e-20), (82.60901, 1e-19),
    (78.05917, 1e-18), (73.51245, 1e-17), (68.96954, 1e-16), (64.43048, 1e-15),
    (59.89615, 1e-14), (55.36699, 1e-13), (50.84417, 1e-12), (46.32844, 1e-11),
    (41.82144, 1e-10), (37.32489, 1e-9), (32.84127, 1e-8), (28.37395, 1e-7),
    (23.92814, 1e-6), (19.51139, 1e-5), (15.13671, 1e-4), (10.82759, 1e-3),
    (6.634897, 0.01), (3.841443, 0.05), (2.705532, 0.1), (2.072251, 0.15),
    (1.642374, 0.2), (1.323304, 0.25), (1.074194, 0.3), (0.8734571, 0.35),
    (0.7083263, 0.4), (0.5706519, 0.45), (0.4549364, 0.5), (0.3573172, 0.55),
    (0.2749959, 0.6), (0.2059001, 0.65), (0.1484719, 0.7), (0.1015310, 0.75),
    (0.06418475, 0.8), (0.03576578, 0.85), (0.01579077, 0.9),
    (0.00393214, 0.95),
]


def fastp(q: float) -> float:
    for thr, p in _FASTP_TABLE:
        if q > thr:
            return p
    if q >= 0.0:
        return 1.0
    return 1.0 - fastp(-q)


def p_chisqr(q) -> float:
    """stdstat.c:136-147.

    The reference passes a C `long double`; callers that build q with
    np.longdouble (80-bit on x86) reproduce its rounding.  The 0.5*q
    product stays extended until the sqrt() call converts to double.
    """
    if q < 0:
        return 1e-26
    if q > 49:
        return fastp(float(q))
    import numpy as _np
    x = float(_np.longdouble(0.5) * q) if isinstance(q, _np.longdouble) \
        else 0.5 * q
    return 1 - 1.772453850 * _erf(math.sqrt(x)) / _TGAMMA_HALF


def power(x: float, n: int) -> float:
    """Exact binary exponentiation as stdstat.c:149-159 (rounding order)."""
    if n:
        y = power(x, n >> 1)
        return y * y * x if (n & 1) else y * y
    return 1.0


def binP(n: int, k: int, p: float) -> float:
    """Binomial point probability (stdstat.c:161-202), for VCF QUAL."""
    q = 1 - p
    if k == 0:
        P = power(q, n)
        return P if P != 0.0 else 1.0e-308
    if n == k:
        P = power(p, n)
        return P if P != 0.0 else 1.0e-308
    if p == 0 or q == 0:
        return 0.0
    P = 1.0
    nk = n - k
    pq = p * q
    i = n + 1
    j = (k if k < nk else nk) + 1
    while j > 1:
        j -= 1
        i -= 1
        P *= (i * pq / j)
    if nk < k:
        P *= power(p, k - nk)
    elif k < nk:
        P *= power(q, nk - k)
    return P if P != 0.0 else 1.0e-308


def cmp_or(t: bool, q: bool) -> bool:
    return bool(t or q)


def cmp_and(t: bool, q: bool) -> bool:
    return bool(t and q)


def cmp_true(t: bool, q: bool) -> bool:
    return True


CMP = {"or": cmp_or, "and": cmp_and, "true": cmp_true}
