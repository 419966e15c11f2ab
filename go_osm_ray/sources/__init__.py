"""Source connectors (SURVEY.md §2.1): OSM-XML reader/writer and helpers.

Parquet/Lance inputs need no connector — ``ray.data.read_parquet`` with
column pruning is the native path; this package covers the formats the
reference engine reads/writes that Ray Data has no built-in reader for.
"""

from .osm_xml import (  # noqa: F401
    parse_osm_xml,
    read_osm_xml,
    read_osm_bounds,
    write_osm_xml,
    planet_to_xml_bytes,
)
