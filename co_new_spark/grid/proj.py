"""EPSG:9377 (MAGNA-SIRGAS / Origen-Nacional) Transverse Mercator, pure numpy.

The reference system pins the projection via ``/root/reference/README.md:33-43``
and ``/root/reference/conf.yaml:21,41-42`` (srid 9377): GRS80 ellipsoid,
lat0=4N, lon0=73W, k0=0.9992, FE=5,000,000, FN=2,000,000.

Implemented as Karney/Krueger 6th-order series (the same series PROJ's
``etmerc`` uses — public algorithm, Karney 2011 "Transverse Mercator with an
accuracy of a few nanometers").  No pyproj dependency: this module is the
vectorized kernel that pandas/Arrow UDFs call on executors.

Accuracy: reproduces the reference's own encode asserts
(``/root/reference/src/assert/gridLib.sql:6-11``) bit-for-bit and every corner
of ``/root/reference/data/grid256.geojson`` to <= ~0.6 m (within that file's
5-decimal lon/lat quantization).
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid
A_SEMI = 6378137.0
INV_F = 298.257222101
F = 1.0 / INV_F
E2 = F * (2.0 - F)
E = np.sqrt(E2)
N_ = F / (2.0 - F)

# EPSG:9377 parameters
LAT0 = 4.0
LON0 = -73.0
K0 = 0.9992
FE = 5_000_000.0
FN = 2_000_000.0

_n = N_
# Rectifying radius
A_CAP = A_SEMI / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0 + _n**6 / 256.0)

# Forward (alpha) series coefficients, order n^6
ALPHA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
        - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
        13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440
        + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
        61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
        + 167603 * _n**6 / 181440,
        49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
        34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
        212378941 * _n**6 / 319334400,
    ]
)

# Inverse (beta) series coefficients, order n^6
BETA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
        - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
        _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
        - 1118711 * _n**6 / 3870720,
        17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
        + 5569 * _n**6 / 90720,
        4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
        4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
        20648693 * _n**6 / 638668800,
    ]
)

_J = np.arange(1, 7, dtype=np.float64)


def _xi_eta(lat_rad: np.ndarray, lon_rad: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Schreiber -> TM (xi, eta) for given lat (rad) and lon offset (rad)."""
    tau = np.tan(lat_rad)
    sigma = np.sinh(E * np.arctanh(E * tau / np.sqrt(1.0 + tau * tau)))
    taup = tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(1.0 + tau * tau)
    xi_p = np.arctan2(taup, np.cos(lon_rad))
    eta_p = np.arcsinh(np.sin(lon_rad) / np.hypot(taup, np.cos(lon_rad)))
    # series: xi = xi' + sum alpha_j sin(2j xi') cosh(2j eta')
    two_xi = 2.0 * np.multiply.outer(_J, xi_p)
    two_eta = 2.0 * np.multiply.outer(_J, eta_p)
    xi = xi_p + np.tensordot(ALPHA, np.sin(two_xi) * np.cosh(two_eta), axes=1)
    eta = eta_p + np.tensordot(ALPHA, np.cos(two_xi) * np.sinh(two_eta), axes=1)
    return xi, eta


# Meridian offset at lat0 so northing at (lat0, lon0) equals FN
_XI0, _ = _xi_eta(np.array([np.deg2rad(LAT0)]), np.array([0.0]))
M0 = K0 * A_CAP * float(_XI0[0])


def forward(lat_deg, lon_deg) -> tuple[np.ndarray, np.ndarray]:
    """WGS84/GRS80 geographic degrees -> EPSG:9377 planar meters (x=easting, y=northing).

    Fully vectorized; NaN in -> NaN out.
    """
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64) - LON0)
    xi, eta = _xi_eta(lat, lon)
    x = FE + K0 * A_CAP * eta
    y = FN + K0 * A_CAP * xi - M0
    return x, y


def inverse(x, y) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:9377 planar meters -> geographic degrees (lat, lon). Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    eta = (x - FE) / (K0 * A_CAP)
    xi = (y - FN + M0) / (K0 * A_CAP)
    two_xi = 2.0 * np.multiply.outer(_J, xi)
    two_eta = 2.0 * np.multiply.outer(_J, eta)
    xi_p = xi - np.tensordot(BETA, np.sin(two_xi) * np.cosh(two_eta), axes=1)
    eta_p = eta - np.tensordot(BETA, np.cos(two_xi) * np.sinh(two_eta), axes=1)
    # Gauss-Schreiber -> tau' (tangent of conformal latitude)
    taup = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    lon = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # Newton solve tau from tau' (Karney 2011 eq. 19-21)
    tau = taup / np.sqrt(1.0 - E2)  # first guess (spherical-ish)
    for _ in range(6):
        sigma = np.sinh(E * np.arctanh(E * tau / np.sqrt(1.0 + tau * tau)))
        taup_i = tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(1.0 + tau * tau)
        dtau = (
            (taup - taup_i)
            * (1.0 + (1.0 - E2) * tau * tau)
            / ((1.0 - E2) * np.sqrt((1.0 + taup_i * taup_i) * (1.0 + tau * tau)))
        )
        tau = tau + dtau
    lat = np.arctan(tau)
    return np.rad2deg(lat), np.rad2deg(lon) + LON0
