"""Heatmap + lake sinks.

K1 parity: the reference renders a folium HeatMap HTML with a bbox polyline
and a fixed legend (functions.py:290-328). Here the *data* side is a proper
sink adapter: the final small heat-triple frame is collected once (the only
collect in the pipeline) and rendered; folium is optional — without it a
standalone GeoJSON document is written instead.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

HEAT_RADIUS = 15
HEAT_BLUR = 25
HEAT_MAX_ZOOM = 13
HEAT_MAX_OPACITY = 0.3


def write_heatmap(df: DataFrame, path: str, bounds: dict) -> str:
    """df(lat, lon, weight) -> HTML heatmap (folium) or GeoJSON fallback.

    Returns the path written.
    """
    triples = [[r[0], r[1], r[2]] for r in df.select("lat", "lon", "weight").collect()]
    center = [
        (bounds["lamin"] + bounds["lamax"]) / 2,
        (bounds["lomin"] + bounds["lomax"]) / 2,
    ]
    try:
        import folium
        from folium.plugins import HeatMap
    except ImportError:
        geo = {
            "type": "FeatureCollection",
            "bbox": [bounds["lomin"], bounds["lamin"], bounds["lomax"], bounds["lamax"]],
            "features": [
                {
                    "type": "Feature",
                    "geometry": {"type": "Point", "coordinates": [lon, lat]},
                    "properties": {"weight": w},
                }
                for lat, lon, w in triples
            ],
        }
        out = path if path.endswith(".geojson") else path + ".geojson"
        with open(out, "w") as f:
            json.dump(geo, f)
        return out

    m = folium.Map(location=center, zoom_start=11)
    corners = [
        [bounds["lamin"], bounds["lomin"]],
        [bounds["lamin"], bounds["lomax"]],
        [bounds["lamax"], bounds["lomax"]],
        [bounds["lamax"], bounds["lomin"]],
        [bounds["lamin"], bounds["lomin"]],
    ]
    folium.PolyLine(corners, color="red", weight=3).add_to(m)
    HeatMap(
        triples,
        radius=HEAT_RADIUS,
        blur=HEAT_BLUR,
        max_zoom=HEAT_MAX_ZOOM,
        max_opacity=HEAT_MAX_OPACITY,
    ).add_to(m)
    m.save(path)
    return path
