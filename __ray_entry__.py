"""Driver contract: entry() smoke pipeline, queries() registry, oracle_sql().

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in geopolars_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry() -> Any:
    """Flagship shape over sf0.001: derived points -> tiles -> PIP join ->
    per-tile two-phase rollup. Returns the rollup Dataset."""
    from geopolars_ray.pipelines.queries import q_geo_tile_rollup

    return q_geo_tile_rollup("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from geopolars_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geopolars_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
