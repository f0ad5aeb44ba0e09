"""Fit + validate the Chebyshev erf polynomial used by ops/activations.py.

erf(z) = z * p(z^2) with p a Chebyshev series over u = z^2 in [0, Z^2],
Z = 3.9 (erf(3.9) = 1 - 3.3e-8, so clamping beyond Z is below f32 noise).

Prints, per degree: the f64 fit error and the error of an f32 Clenshaw
evaluation (simulating exactly what ops/activations.gelu_erf computes).
Degree 14 is the shipped setting: 3.2e-7 on erf, 9.5e-7 on GELU.

Run: python scripts/fit_gelu_poly.py
"""

from __future__ import annotations

import numpy as np
import numpy.polynomial.chebyshev as cheb
from scipy.special import erf

Z = 3.9
U = Z * Z


def fit(degree: int) -> np.ndarray:
    nodes = (np.cos(np.pi * (np.arange(4000) + 0.5) / 4000) + 1) / 2 * U
    g = erf(np.sqrt(nodes)) / np.sqrt(nodes)
    return cheb.chebfit(2 * nodes / U - 1, g, degree)


def f32_clenshaw_err(coef: np.ndarray) -> float:
    z = np.linspace(0, Z, 200001)[1:]
    t = (2 * (z * z) / U - 1).astype(np.float32)
    b1 = np.zeros_like(t)
    b2 = np.zeros_like(t)
    cf = coef.astype(np.float32)
    for k in range(len(coef) - 1, 0, -1):
        b1, b2 = (np.float32(2) * t * b1 - b2 + cf[k]).astype(np.float32), b1
    p = (t * b1 - b2 + cf[0]).astype(np.float32)
    approx = (z.astype(np.float32) * p).astype(np.float64)
    return float(np.max(np.abs(approx - erf(z))))


def main() -> None:
    for degree in (6, 8, 10, 12, 14, 16):
        coef = fit(degree)
        z = np.linspace(0, Z, 200001)[1:]
        err64 = np.max(np.abs(z * cheb.chebval(2 * z * z / U - 1, coef) - erf(z)))
        print(f"deg {degree:2d}: f64 {err64:.2e}  f32-clenshaw {f32_clenshaw_err(coef):.2e}")
        if degree == 14:
            print("  coefficients for ops/activations.py:")
            for c in coef:
                print(f"    {c!r},")


if __name__ == "__main__":
    main()
