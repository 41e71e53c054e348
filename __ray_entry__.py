"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in hsearch_ray) calls ray.init()/ray.shutdown().

entry()      : flagship near-dup pipeline on /root/testdata/sf0.001 documents.
queries()    : one entry per implemented operator/pipeline (SURVEY.md §2).
oracle_sql() : DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: MinHash-LSH near-dup detection + clustering over
    the sf0.001 documents table adapted to the north-rule corpus shape."""
    from hsearch_ray.pipelines.queries import q_near_dup_clusters_docs

    return q_near_dup_clusters_docs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from hsearch_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hsearch_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
