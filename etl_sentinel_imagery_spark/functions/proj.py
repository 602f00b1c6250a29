"""Ellipsoidal UTM ↔ WGS84 — Krüger series, numpy-vectorized.

Replaces the spherical transverse-mercator stand-in: the reference
reprojects with rasterio/PROJ (`/root/reference/code/tx.py:49-71`),
which is ellipsoidal. These are the public Krüger/Karney series
(Karney 2011, "Transverse Mercator with an accuracy of a few
nanometers"; coefficients to n⁶), accurate to sub-millimeter within a
UTM zone's extent — far below a 10 m Sentinel-2 pixel.

Forward: geographic → conformal (τ via atanh terms) → TM via the α
series. Inverse: β series back to conformal, then the conformal→
geographic rectifying series in sin(2kχ).
"""

from __future__ import annotations

import math

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0  # false easting
_FN_SOUTH = 10000000.0

_N = _F / (2.0 - _F)  # third flattening
_E = math.sqrt(_F * (2.0 - _F))  # eccentricity
#: rectifying radius
_A_RECT = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440 + 281 * _N**5 / 630
    - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
    - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
)
#: conformal → geographic rectifying series (χ → φ)
_DELTA = (
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3 + 116 * _N**4 / 45
    + 26 * _N**5 / 45 - 2854 * _N**6 / 675,
    7 * _N**2 / 3 - 8 * _N**3 / 5 - 227 * _N**4 / 45 + 2704 * _N**5 / 315
    + 2323 * _N**6 / 945,
    56 * _N**3 / 15 - 136 * _N**4 / 35 - 1262 * _N**5 / 105
    + 73814 * _N**6 / 2835,
    4279 * _N**4 / 315 - 332 * _N**5 / 35 - 399572 * _N**6 / 7875,
    4174 * _N**5 / 315 - 144838 * _N**6 / 6237,
    601676 * _N**6 / 22275,
)


def _lon0(zone: int) -> float:
    return math.radians(zone * 6 - 183)


def utm_forward(zone: int, northern: bool = True):
    """Vectorized (lon°, lat°) → (easting, northing) for a UTM zone."""
    lon0 = _lon0(zone)

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=float)) - lon0
        phi = np.radians(np.asarray(lat, dtype=float))
        s = np.sin(phi)
        # conformal latitude's tangent via Gauss-Schreiber
        t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
        x, y = eta.copy(), xi.copy()
        for j, a in enumerate(_ALPHA, start=1):
            x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
            y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        easting = _E0 + _K0 * _A_RECT * x
        northing = _K0 * _A_RECT * y + (0.0 if northern else _FN_SOUTH)
        return easting, northing

    return fwd


def utm_inverse(zone: int, northern: bool = True):
    """Vectorized (easting, northing) → (lon°, lat°) for a UTM zone."""
    lon0 = _lon0(zone)

    def inv(x, y):
        eta = (np.asarray(x, dtype=float) - _E0) / (_K0 * _A_RECT)
        xi = (
            np.asarray(y, dtype=float) - (0.0 if northern else _FN_SOUTH)
        ) / (_K0 * _A_RECT)
        xi_p, eta_p = xi.copy(), eta.copy()
        for j, b in enumerate(_BETA, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
        phi = chi.copy()
        for j, d in enumerate(_DELTA, start=1):
            phi += d * np.sin(2 * j * chi)
        return np.degrees(lam + lon0), np.degrees(phi)

    return inv
