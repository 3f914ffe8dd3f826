"""EPSG:3067 forward transform as pure Catalyst expressions.

The numpy kernel (crs/tm35fin.py) is the engine's oracle-exact default:
the synthetic truths, the PIP/kNN goldens and the driver's value-hash
gate are all computed through the same numpy libm, so every comparison
is bit-identical. This module is the JVM twin for pipelines that want
ZERO Python anywhere — the same Karney n^6 series, same constants,
same operation order, but evaluated by Spark's java.lang.Math.

Accuracy contract: java.lang.Math and numpy's libm may differ by ~1 ulp
on the transcendentals (sin/cos/sinh/atanh/...), so the two kernels can
diverge by O(nanometers) in the plane. That is physically irrelevant
(the reference rounds to integer meters) but it is NOT bit-identical,
which is why the pandas kernel remains the default wherever output is
hash-compared against the generator truths. test_crs_expr.py bounds the
divergence (< 1e-6 m over the working window) and asserts that every
generated dataset point is far enough from all km-grid boundaries that
cell assignments cannot flip between the kernels.

At 100 TB: projecting inside whole-stage codegen removes the last
Python stage from the scan -> extract -> project -> tile core, so the
entire flagship pipeline runs without Python workers or Arrow IPC.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fgcspark.crs.tm35fin import _AHAT, _ALPHA, _E, FE, FN, K0, LON0


def tm35_cols(lon: Column, lat: Column) -> Column:
    """struct<e:double, n:double> — EPSG:3067 easting/northing of a
    WGS84/ETRS89 (lon, lat) degree pair, Karney n^6 forward series,
    all inside whole-stage codegen."""
    phi = F.radians(lat)
    lam = F.radians(lon - F.lit(LON0))
    sphi = F.sin(phi)
    # conformal latitude tau' = sinh(atanh(sin phi) - e atanh(e sin phi))
    t = F.sinh(F.atanh(sphi) - F.lit(float(_E)) * F.atanh(F.lit(float(_E)) * sphi))
    clam = F.cos(lam)
    xi_p = F.atan2(t, clam)
    eta_p = F.asinh(F.sin(lam) / F.sqrt(t * t + clam * clam))

    xi = xi_p
    eta = eta_p
    for j in range(1, 7):
        a = F.lit(float(_ALPHA[j - 1]))
        xi = xi + a * F.sin(F.lit(2.0 * j) * xi_p) * F.cosh(F.lit(2.0 * j) * eta_p)
        eta = eta + a * F.cos(F.lit(2.0 * j) * xi_p) * F.sinh(F.lit(2.0 * j) * eta_p)

    e = F.lit(float(FE)) + F.lit(float(K0 * _AHAT)) * eta
    n = F.lit(float(FN)) + F.lit(float(K0 * _AHAT)) * xi
    return F.struct(e.alias("e"), n.alias("n"))
