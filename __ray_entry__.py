"""Driver contract for the graft builder (Ray Data target).

entry(): flagship spatial-join pipeline (synthetic Common-Crawl-style
pages per input_hint -> geocode -> S2 encode -> cell-prefix join vs
polygon coverings -> exact PIP refinement) at sf0.001 scale.

queries(): one callable per implemented operator/pipeline from
SURVEY.md §2 plus the training-data family; each takes sf_dir.

oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query;
S2-specific / sketch operators are registered without oracles (the
driver records rows-only checks; their exactness oracles are the
brute-force comparisons in tests/).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s2geometry_d_ray.pipelines import geo_queries as _geo
from s2geometry_d_ray.pipelines import relational as _rel
from s2geometry_d_ray.pipelines import training_data as _td


def entry() -> Any:
    """Flagship pipeline; driver checks rows >= 0 and a stable schema."""
    from s2geometry_d_ray.pipelines.spatial_join import flagship
    ds = flagship(n_pages=5000, n_polygons=30, concurrency=4)
    return ds


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    out.update(_geo.QUERIES)
    out.update(_rel.QUERIES)
    out.update(_td.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_geo.ORACLE)
    out.update(_rel.ORACLE)
    out.update(_td.ORACLE)
    # Some oracles are expensive to BUILD (they replay a fixture
    # pipeline to emit literals) and are registered as callables so
    # importing the pipeline modules stays cheap; resolve them here.
    return {k: (v() if callable(v) else v) for k, v in out.items()}
