"""go_osm_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of spatialcurrent/go-osm's query/transform
semantics (see SURVEY.md) as idiomatic Ray Data pipelines:
``ray.data.Dataset`` → vectorized ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages (polygon indexes, image codecs),
explicit hash-shuffle joins and partial aggregation for the wide steps.

Nothing here calls ``ray.init()`` — sessions are owned by the caller
(bench.py, the CLI, the test fixture, or the driver).
"""

__version__ = "0.1.0"
