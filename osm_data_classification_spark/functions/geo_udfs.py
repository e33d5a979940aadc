"""Vectorized pandas-UDF twins of the JVM geo expressions.

The hot path stays JVM-side (geo/cells.py Column expressions,
sources/pages.py geocode_cols — whole-stage codegen, no Python). These
Arrow-batched twins exist for the API-parity surface the north-star
names ("batched H3/S2 cell encoding ... via vectorized pandas/Arrow
UDFs", BASELINE.json:6): callers that need cell math inside an
existing pandas-UDF kernel (PIP refine, custom scoring) use the numpy
kernels directly; callers composing DataFrame plans may use either
column family — tests/test_functions.py pins both families to
identical outputs.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from ..geo.cells import encode_np, parent_np
from ..sources.pages import LAT_OFF, LAT_STEP, LON_OFF, LON_STEP

_LOC_RE = re.compile(r"loc_(\d+)_(\d+)")


def cell_encode_udf(res: int):
    """Series(lon), Series(lat) -> Series(cell id) at a fixed res."""

    @pandas_udf("long")
    def encode(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(encode_np(lon.to_numpy(), lat.to_numpy(), res))

    return encode


def cell_parent_udf(parent_res: int):
    @pandas_udf("long")
    def parent(cell: pd.Series) -> pd.Series:
        return pd.Series(parent_np(cell.to_numpy(), parent_res))

    return parent


def _geocode_pdf(text: pd.Series) -> pd.DataFrame:
    # vectorized extract (pandas str kernels), no per-row Python loop —
    # this twin mirrors the JVM geocode_cols hot path at pandas speed
    ext = text.fillna("").str.extract(_LOC_RE)
    i = pd.to_numeric(ext[0], errors="coerce").to_numpy(dtype=np.float64)
    j = pd.to_numeric(ext[1], errors="coerce").to_numpy(dtype=np.float64)
    lon = -180.0 + i * LON_STEP + LON_OFF
    lat = -90.0 + j * LAT_STEP + LAT_OFF
    return pd.DataFrame({"lon": lon, "lat": lat})


def geocode_udf(text: Column) -> Column:
    """Deterministic geocoder (place-token inverse) as an Arrow UDF —
    semantics identical to sources.pages.geocode_cols. (Factory form:
    pandas_udf parses its DDL schema against the ACTIVE session, so the
    udf object cannot be built at import time.)"""

    @pandas_udf("struct<lon:double, lat:double>")
    def geocode(t: pd.Series) -> pd.DataFrame:
        return _geocode_pdf(t)

    return geocode(text)


def geocode_and_encode(text: Column, res: int) -> Column:
    """Fused geocode+encode in ONE Python stage (SURVEY.md §3.2
    'minimize stage count by fusing kernels') — one Arrow round-trip
    instead of two."""

    @pandas_udf("struct<lon:double, lat:double, cell:long>")
    def fused(t: pd.Series) -> pd.DataFrame:
        pdf = _geocode_pdf(t)
        pdf["cell"] = encode_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), res)
        return pdf

    return fused(text)
