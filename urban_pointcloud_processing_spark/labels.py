"""Label taxonomy, mirroring the reference's static codes.

Reference: /root/reference/src/upcp/labels.py:8-22 (codes) and :24-81
(string dictionary). Values are copied semantics (public constants),
not code.
"""

from __future__ import annotations


class Labels:
    UNKNOWN = 0
    ROAD = 1
    GROUND = 9
    BUILDING = 10
    TREE = 30
    CAR = 40
    STREET_LIGHT = 60
    TRAFFIC_SIGN = 62
    TRAM_CABLE = 70
    CABLE = 79
    CITY_BENCH = 80
    RUBBISH_BIN = 81
    ARMATUUR = 90
    NOISE = 99

    STR_DICT = {
        0: "Unknown",
        1: "Road",
        9: "Ground",
        10: "Building",
        30: "Tree",
        40: "Car",
        60: "Street light",
        62: "Traffic sign",
        70: "Tram cable",
        79: "Cable",
        80: "City bench",
        81: "Rubbish bin",
        90: "Armatuur",
        99: "Noise",
    }

    @staticmethod
    def get_str(label: int) -> str:
        return Labels.STR_DICT.get(label, "Unknown")
