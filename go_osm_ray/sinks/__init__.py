"""Sink connectors (SURVEY.md §2.2): GeoJSON/GeoJSONL feature writers.

Parquet outputs go through ``Dataset.write_parquet`` / the lineage-aware
``state.write_partitioned``; OSM-XML through ``sources.osm_xml``.
"""

from .geojson import (  # noqa: F401
    nodes_to_features,
    ways_to_features,
    write_geojson,
    write_geojsonl,
)
from .tiles import (  # noqa: F401
    raster_max_n,
    render_tile_pngs,
)
