"""Geodesy: WGS-84 lat/lon -> UTM (the reference converts NMEA/NavSat fixes
with ROS geodesy's `fromMsg` before adding GPS priors,
`global_graph_nodelet.cpp:407-441`).

Standard Krueger series (the same truncation used by geodesy/proj for
meter-level work); accurate to << 1 mm within a UTM zone.
"""

from __future__ import annotations

import math
from typing import Tuple

_A = 6378137.0                 # WGS-84 semi-major axis
_F = 1.0 / 298.257223563       # flattening
_K0 = 0.9996                   # UTM scale factor
_E2 = _F * (2.0 - _F)          # first eccentricity squared


def latlon_to_utm(lat_deg: float, lon_deg: float) -> Tuple[float, float, int, str]:
    """-> (easting, northing, zone number, hemisphere 'N'/'S')."""
    zone = int((lon_deg + 180.0) // 6.0) + 1
    lon0 = math.radians((zone - 1) * 6 - 180 + 3)
    lat = math.radians(lat_deg)
    lon = math.radians(lon_deg)

    n = _A / math.sqrt(1.0 - _E2 * math.sin(lat) ** 2)
    t = math.tan(lat) ** 2
    c = _E2 / (1.0 - _E2) * math.cos(lat) ** 2
    a_ = math.cos(lat) * (lon - lon0)

    e4, e6 = _E2**2, _E2**3
    m = _A * (
        (1 - _E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
        - (3 * _E2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * lat)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * lat)
        - (35 * e6 / 3072) * math.sin(6 * lat)
    )
    ep2 = _E2 / (1.0 - _E2)

    easting = _K0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * a_**5 / 120
    ) + 500000.0
    northing = _K0 * (
        m
        + n * math.tan(lat) * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * a_**6 / 720
        )
    )
    hemisphere = "N"
    if lat_deg < 0:
        northing += 10000000.0
        hemisphere = "S"
    return easting, northing, zone, hemisphere


def gprmc_to_utm(sentence: str):
    """NMEA $GPRMC -> (easting, northing) or None — the full reference GPS
    ingestion path (`nmea_sentence_parser.hpp` + geodesy)."""
    from lv_slam_tpu.utils.nmea import parse_gprmc

    fix = parse_gprmc(sentence)
    if fix is None or fix.status != "A":
        return None
    e, n, _, _ = latlon_to_utm(fix.latitude, fix.longitude)
    return e, n
