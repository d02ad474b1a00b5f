"""NMEA $GPRMC sentence parser (reference
`include/global_graph/nmea_sentence_parser.hpp:13-117`): extracts latitude /
longitude (degrees-minutes -> decimal degrees) from valid RMC sentences,
feeding the GPS prior path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class GPRMC:
    latitude: float    # decimal degrees, N positive
    longitude: float   # decimal degrees, E positive
    status: str        # 'A' = active/valid


def _deg_min_to_decimal(value: float) -> float:
    """ddmm.mmmm -> decimal degrees (the reference's degmin2deg)."""
    degrees = int(value) // 100
    minutes = value - degrees * 100.0
    return degrees + minutes / 60.0


def parse_gprmc(sentence: str) -> Optional[GPRMC]:
    """Parse one $GPRMC sentence; returns None for other/invalid sentences."""
    sentence = sentence.strip()
    if "*" in sentence:
        body, checksum = sentence.rsplit("*", 1)
        payload = body[1:] if body.startswith("$") else body
        calc = 0
        for ch in payload:
            calc ^= ord(ch)
        try:
            if calc != int(checksum, 16):
                return None
        except ValueError:
            return None
        sentence = body
    fields = sentence.split(",")
    if not fields or not fields[0].endswith("GPRMC"):
        return None
    if len(fields) < 7:
        return None
    status = fields[2]
    if status != "A":
        return GPRMC(latitude=float("nan"), longitude=float("nan"), status=status)
    try:
        lat = _deg_min_to_decimal(float(fields[3]))
        lon = _deg_min_to_decimal(float(fields[5]))
    except ValueError:
        return None
    if fields[4] == "S":
        lat = -lat
    if fields[6] == "W":
        lon = -lon
    return GPRMC(latitude=lat, longitude=lon, status=status)
