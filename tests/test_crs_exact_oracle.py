"""Off-meridian known-answer oracle for the EPSG:3067 transform.

Round-1 verdict: the quadrature oracle pinned only the central
meridian; an off-meridian systematic error in the engine's hardcoded
alpha/beta series could pass every gate. This file closes that hole
with an EXACT transverse Mercator evaluated independently at 40
significant digits with mpmath:

- conformal latitude chi(phi): closed form (public textbook formula),
- rectifying latitude mu(phi): meridian-arc quadrature (mp.quad),
- the Gauss-Krueger map is the analytic continuation of chi -> mu;
  since mu(chi) - chi is an odd pi-periodic analytic function, its
  exact Fourier sine coefficients a_j (recovered here by DFT from
  32 quadrature samples — NOT from any published series polynomial)
  give the exact map as zeta + sum a_j sin(2 j zeta) evaluated at
  complex zeta. Truncation at j=15 leaves ~n^16 ~ 1e-45 error.

Nothing here shares code, series coefficients, or approximation order
with fgcspark.crs.tm35fin (numpy, Karney n^6 polynomials in n); only
the projection DEFINITION (GRS80, lon0=27, k0=0.9996, FE=500000) is
common, as it must be. Agreement is required to < 0.1 mm across the
full Finnish window including the +-8 degree longitude extremes.
"""

import numpy as np
import pytest

mp_mod = pytest.importorskip("mpmath")
mp = mp_mod.mp

from fgcspark.crs import tm35fin as tm

DPS = 40
N_SAMPLES = 32  # DFT samples; aliasing from j>=16 is ~1e-45
N_COEF = 15


def _exact_setup():
    """Build (alpha_coeffs, rectifying_radius, helpers) at DPS digits."""
    mp.dps = DPS
    a = mp.mpf(6378137)
    f = 1 / mp.mpf("298.257222101")
    e2 = f * (2 - f)
    e = mp.sqrt(e2)
    pi = mp.pi

    def chi_of_phi(phi):
        s = mp.sin(phi)
        return mp.atan(mp.sinh(mp.atanh(s) - e * mp.atanh(e * s)))

    def arc(phi):  # meridian arc length from equator
        return a * (1 - e2) * mp.quad(
            lambda t: (1 - e2 * mp.sin(t) ** 2) ** mp.mpf("-1.5"), [0, phi]
        )

    m_quarter = arc(pi / 2)
    a_rect = m_quarter / (pi / 2)

    def mu_of_phi(phi):
        return arc(phi) / m_quarter * (pi / 2)

    def phi_of_chi(chi):
        if chi == 0:
            return mp.mpf(0)
        return mp.findroot(lambda p: chi_of_phi(p) - chi, chi)

    # g(chi) = mu - chi is odd with period pi: g = sum_j alpha_j sin(2 j chi).
    # Exact DFT recovery from N samples over [0, pi); phi(chi) only
    # exists on [0, pi/2], so the upper half comes from the identity
    # g(pi - chi) = -g(chi) (and g(pi/2) = 0 since mu(pi/2) = pi/2).
    ks = range(N_SAMPLES)
    half = [
        mu_of_phi(phi_of_chi(pi * k / N_SAMPLES)) - pi * k / N_SAMPLES
        for k in range(N_SAMPLES // 2)
    ]
    g = half + [mp.mpf(0)] + [-half[N_SAMPLES - k] for k in range(N_SAMPLES // 2 + 1, N_SAMPLES)]
    alpha = [
        (2 / mp.mpf(N_SAMPLES))
        * mp.fsum(g[k] * mp.sin(2 * j * pi * k / N_SAMPLES) for k in ks)
        for j in range(1, N_COEF + 1)
    ]
    return alpha, a_rect, chi_of_phi


@pytest.fixture(scope="module")
def exact():
    alpha, a_rect, chi_of_phi = _exact_setup()
    k0 = mp.mpf("0.9996")
    lon0 = mp.mpf(27)

    def forward(lon_deg, lat_deg):
        phi = mp.radians(mp.mpf(str(lat_deg)))
        lam = mp.radians(mp.mpf(str(lon_deg)) - lon0)
        t = mp.tan(chi_of_phi(phi))
        cl = mp.cos(lam)
        xi_p = mp.atan2(t, cl)
        eta_p = mp.asinh(mp.sin(lam) / mp.sqrt(t * t + cl * cl))
        z = mp.mpc(xi_p, eta_p)
        w = z + mp.fsum(alpha[j - 1] * mp.sin(2 * j * z) for j in range(1, N_COEF + 1))
        return float(500000 + k0 * a_rect * w.imag), float(k0 * a_rect * w.real)

    return forward


# grid spanning the full 3067 area of use, incl. +-8 deg off-meridian
_LONS = [19.1, 21.5, 24.0, 27.0, 29.5, 31.6]
_LATS = [59.5, 62.3, 65.0, 68.2, 70.1]


def test_forward_matches_exact_offmeridian(exact):
    worst = 0.0
    for lon in _LONS:
        for lat in _LATS:
            ex, nx = exact(lon, lat)
            e_eng, n_eng = tm.geodetic_to_tm35(lon, lat)
            worst = max(worst, abs(float(e_eng) - ex), abs(float(n_eng) - nx))
    assert worst < 1e-4, f"engine deviates {worst:.2e} m from exact TM"


def test_inverse_matches_exact_offmeridian(exact):
    for lon in (19.1, 27.0, 31.6):
        for lat in (59.5, 70.1):
            ex, nx = exact(lon, lat)
            lon2, lat2 = tm.tm35_to_geodetic(ex, nx)
            # 1e-9 deg ~ 0.1 mm ground distance
            assert float(lon2) == pytest.approx(lon, abs=1e-9)
            assert float(lat2) == pytest.approx(lat, abs=1e-9)


def test_exact_oracle_self_check(exact):
    # the oracle must reproduce the independently-quadratured meridian
    # arc on the central meridian (ties this file to test_crs.py's
    # first-principles anchor)
    e0, n0 = exact(27.0, 64.0)
    assert e0 == pytest.approx(500000.0, abs=1e-9)
    assert n0 == pytest.approx(0.9996 * tm.meridian_arc_numeric(64.0), abs=1e-3)
