"""Driver contract for the ophois_ray engine.

The driver initialises Ray itself before importing this module: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``   — flagship pipeline on /root/testdata/sf0.001: pages
  derived from the documents table (input_hint schema) are extracted
  (actor pool), geotagged, url-deduped and kNN-snapped to a synthetic
  street graph; returns the snapped Dataset.
- ``queries()`` — one callable per implemented operator family from
  SURVEY.md §2 (see ophois_ray/queries.py for the catalog).
- ``oracle_sql()`` — DuckDB statements mirroring the SQL-expressible
  queries op-for-op (identical IEEE op order; integer outputs).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from ophois_ray import pipelines

    return pipelines.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ophois_ray import queries as q

    return q.catalog()


def oracle_sql() -> dict[str, str]:
    from ophois_ray import queries as q

    return q.sql_catalog()


def no_oracle_reasons() -> dict[str, str]:
    """Documentation hook (not part of the driver contract): why each
    rows-only query has no SQL mirror — seeded LSH banding, float
    summation order, or procedural graph fixpoints; see
    ophois_ray/queries.py::no_oracle_reasons."""
    from ophois_ray import queries as q

    return q.no_oracle_reasons()
