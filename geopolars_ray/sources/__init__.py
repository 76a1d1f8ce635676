"""Sources & sinks: synthetic pages/admin tables, parquet IO helpers."""

from geopolars_ray.sources.io import read_parquet_exchange  # noqa: F401
from geopolars_ray.sources.pages import (  # noqa: F401
    generate_pages_parquet,
    admin_polygons_table,
    row_fields,
    make_html,
    extract_text,
    extract_geotag,
)
