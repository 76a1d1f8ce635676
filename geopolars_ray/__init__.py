"""geopolars_ray — a Ray-Data-native geospatial data-processing engine.

A from-scratch reimplementation of the *semantics* of geopolars/geopolars
(reference surveyed in SURVEY.md) on top of ``ray.data.Dataset``:

- geometry columns are Arrow ``binary`` (ISO WKB) or GeoArrow nested arrays,
  decoded zero-copy into a flat ragged NumPy representation
  (:class:`geopolars_ray.geom.array.GeometryArray`);
- every GeoSeries op from the reference
  (``/root/reference/geopolars/geopolars-geo/src/geoseries.rs:10-181``) is a
  vectorized stateless ``map_batches`` kernel (:mod:`geopolars_ray.stages.geo`);
- the spatial join
  (``/root/reference/geopolars/src/spatial_index.rs:37-204``) is a broadcast
  actor-pool stage holding a packed STR-tree, with a partitioned
  (hash-shuffle-by-cell) variant for large-large joins
  (:mod:`geopolars_ray.stages.join`);
- tiling (S2 cells, lat/lon grid) and per-tile rollups compose with native
  Ray Data ``groupby``/``aggregate``/``sort``.

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (bench.py, tests/conftest.py, or the grading driver).
"""

__version__ = "0.1.0"
