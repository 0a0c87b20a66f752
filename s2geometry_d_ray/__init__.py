"""s2geometry_d_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``vnayar/s2geometry-d`` (itself a D port of Google's S2 geometry library),
re-expressed as vectorized NumPy kernels over zero-copy Arrow batches inside
``ray.data.Dataset`` pipelines, with actor pools for stateful stages
(shape indexes, kNN point indexes).

Layout:
  core/      pure-NumPy S2 math (no Ray dependency): coords, cellid, regions,
             predicates, coverer, cell unions, polygons, kNN search.
  sources/   deterministic synthetic generators (pages / polygons per the
             input_hint schema) + parquet readers with column pruning.
  stages/    map_batches kernels: stateless fns (geocode, encode, tile) and
             callable classes for actor pools (PIP refine, kNN).
  pipelines/ end-to-end Dataset pipelines (spatial join, tiling, dedup, ANN,
             text analysis, relational queries).
  state/     broadcast helpers (ray.put once, read everywhere) and
             per-partition lineage/metrics records for checkpoint-resume.

IMPORTANT: nothing in this package calls ray.init()/ray.shutdown(); sessions
are owned by bench.py / CLI entry points / the test fixture.
"""

__version__ = "0.1.0"
