"""Assembles the full query catalog from every operator module.

One entry per operator row in SURVEY.md §2 (plus the training-data
pipeline ops). Import side effects populate each module's CATALOG.
"""

from __future__ import annotations

from .operators.relational import CATALOG as _RELATIONAL
from .operators.relational import QuerySpec


def full_catalog() -> dict[str, QuerySpec]:
    cat: dict[str, QuerySpec] = {}
    cat.update(_RELATIONAL)
    for modname in ("dedup", "text", "similarity", "geo_queries", "ml_queries",
                    "multimodal", "ref_features", "skew_queries", "grouped", "sql_surface", "temporal", "components"):
        mod = __import__(
            f"osm_data_classification_spark.operators.{modname}",
            fromlist=["CATALOG"],
        )
        cat.update(mod.CATALOG)
    # a broken operator module must fail LOUDLY here — swallowing the
    # ImportError would silently drop its queries from the driver gate
    assert len(cat) >= 75, f"catalog unexpectedly small: {len(cat)}"
    return cat
