"""Coordinate reprojection: EPSG:2272 (NAD83 / Pennsylvania South,
US survey feet) → EPSG:4326, closed form.

The reference reprojects every geometry to 4326 before publishing
(ago/ago.py:351-427 pyproj Transformer 2272→4326; opendata.py:186-244
projects to 4326 then extracts lat/lng). pyproj doesn't ship in this
sandbox, but EPSG:2272 is a Lambert Conformal Conic (2SP — EPSG
method 9802) whose forward/inverse are public closed-form formulas
(EPSG Guidance Note 7-2 §3.1.1; Snyder 1987 §15) over the GRS80
ellipsoid, with NAD83→WGS84 treated as identity (sub-meter, standard
practice for web publishing).

The inverse is built ONCE as a SQL expression string and used
verbatim by BOTH the Spark plan (``F.expr``) and the DuckDB oracle —
structural identity means both engines run the same double-precision
op sequence, so agreement holds to libm's last ulp; outputs are
rounded to 7 decimals (~1 cm) anyway. All projection constants are
derived at import time from the EPSG-published defining parameters.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- EPSG:2272 defining parameters (EPSG registry, public) -------------
A = 6378137.0                     # GRS80 semi-major axis (m)
F_INV = 298.257222101             # GRS80 inverse flattening
E2 = 2.0 / F_INV - 1.0 / F_INV**2
E = math.sqrt(E2)
LAT1 = math.radians(40.0 + 58.0 / 60.0)    # standard parallel 1: 40°58'N
LAT2 = math.radians(39.0 + 56.0 / 60.0)    # standard parallel 2: 39°56'N
LAT0 = math.radians(39.0 + 20.0 / 60.0)    # latitude of origin:  39°20'N
LON0_DEG = -(77.0 + 45.0 / 60.0)           # central meridian:    77°45'W
FE_M = 600_000.0                  # false easting (1,968,500 ftUS exactly)
FN_M = 0.0
FT_US = 1200.0 / 3937.0           # US survey foot in meters (exact ratio)


def _m(phi: float) -> float:
    return math.cos(phi) / math.sqrt(1.0 - E2 * math.sin(phi) ** 2)


def _t(phi: float) -> float:
    return math.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - E * math.sin(phi)) / (1.0 + E * math.sin(phi))
    ) ** (E / 2.0)


_M1, _M2 = _m(LAT1), _m(LAT2)
_T0, _T1, _T2 = _t(LAT0), _t(LAT1), _t(LAT2)
N = (math.log(_M1) - math.log(_M2)) / (math.log(_T1) - math.log(_T2))
F_LCC = _M1 / (N * _T1**N)
R0 = A * F_LCC * _T0**N           # radius at the latitude of origin
AF = A * F_LCC


def _d(v: float) -> str:
    """Double-typed SQL literal: DuckDB types bare decimal literals as
    DECIMAL (whose fixed-point multiply overflows here); a literal
    with an exponent is DOUBLE in both engines."""
    s = repr(float(v))
    return s if "e" in s or "E" in s else s + "e0"


def lcc_2272_inverse_sql(x_ft_sql: str, y_ft_sql: str, round_digits: int = 7) -> tuple[str, str]:
    """(lng_sql, lat_sql) — the LCC-2SP inverse as one SQL expression
    string per output, parsable by Spark SQL and DuckDB alike (uses
    only sqrt/pow/atan/atan2/sin/degrees/pi/round). The isometric→
    geodetic latitude series has no closed form; six fixed-point
    iterations are unrolled (convergence is < 1e-12 rad after four at
    these latitudes)."""
    e_m = f"(CAST({x_ft_sql} AS DOUBLE) * {_d(FT_US)} - {_d(FE_M)})"
    n_m = f"(CAST({y_ft_sql} AS DOUBLE) * {_d(FT_US)} - {_d(FN_M)})"
    rp = f"sqrt({e_m} * {e_m} + ({_d(R0)} - {n_m}) * ({_d(R0)} - {n_m}))"
    tp = f"pow({rp} / {_d(AF)}, {_d(1.0 / N)})"
    theta = f"atan2({e_m}, {_d(R0)} - {n_m})"
    lng = f"round(degrees({theta}) / {_d(N)} + {_d(LON0_DEG)}, {round_digits})"
    phi = f"(pi() / 2 - 2 * atan({tp}))"
    for _ in range(6):
        phi = (
            f"(pi() / 2 - 2 * atan({tp} * pow((1 - {_d(E)} * sin({phi}))"
            f" / (1 + {_d(E)} * sin({phi})), {_d(E / 2.0)})))"
        )
    lat = f"round(degrees({phi}), {round_digits})"
    return lng, lat


def reproject_2272_to_4326(
    df: DataFrame,
    x_col: str,
    y_col: str,
    lat_col: str = "lat",
    lng_col: str = "lng",
    round_digits: int = 7,
) -> DataFrame:
    """T6 (ref: ago/ago.py:351-427, opendata.py:186-244): state-plane
    feet → WGS84 degrees as pure column math — JVM-side, whole-stage
    codegen'd (Catalyst's subexpression elimination dedupes the
    repeated subtrees), no Python in the loop. NULL coordinates pass
    through as NULL."""
    lng_sql, lat_sql = lcc_2272_inverse_sql(x_col, y_col, round_digits)
    return df.withColumn(lng_col, F.expr(lng_sql)).withColumn(lat_col, F.expr(lat_sql))


def lcc_2272_forward(lat_deg: float, lon_deg: float) -> tuple[float, float]:
    """Plain-Python forward projection (4326 → 2272 ftUS) — the
    independent leg for roundtrip verification in tests."""
    phi, lam = math.radians(lat_deg), math.radians(lon_deg)
    t = _t(phi)
    r = AF * t**N
    theta = N * (lam - math.radians(LON0_DEG))
    x_m = FE_M + r * math.sin(theta)
    y_m = FN_M + R0 - r * math.cos(theta)
    return x_m / FT_US, y_m / FT_US
