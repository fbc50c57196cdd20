"""Geospatial joins — grid-blocked haversine, the [EXT] spatial
surface (the reference has none; q281/q282 are the workload forms).

Scale shape shared by both operators: points hash to lat/lon grid
cells sized so any within-radius pair is at most one cell apart, the
probe side explodes to its 3×3 cell neighborhood, and candidates come
from an EQUI join on the cell key — Σ per-cell |A|·|B| work instead of
|A|·|B|, the same blocking contract as the n-gram inverted index and
the q260 banded cosine join.  The exact haversine refine runs only on
candidates, on the ROUNDed distance so threshold comparisons are
engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
# km per degree of latitude (and of longitude at the equator)
_KM_PER_DEG = 111.0


def haversine_km(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in km (double, unrounded)."""
    dlat = F.radians(lat_b - lat_a) / 2
    dlon = F.radians(lon_b - lon_a) / 2
    return (
        2
        * EARTH_RADIUS_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(dlat), 2)
                + F.cos(F.radians(lat_a))
                * F.cos(F.radians(lat_b))
                * F.pow(F.sin(dlon), 2)
            )
        )
    )


def _with_cells(
    df: DataFrame, lat: str, lon: str, radius_km: float, max_abs_lat: float
):
    lat_cell_deg = radius_km / _KM_PER_DEG
    import math

    lon_cell_min = lat_cell_deg / max(
        math.cos(math.radians(max_abs_lat)), 1e-6
    )
    # Round the lon cell width UP so it divides 360 exactly and wrap
    # the cell key modulo the cell count: cell 0 and cell n−1 are then
    # true neighbors, so within-radius pairs straddling the
    # antimeridian (lon ≈ ±180) land in adjacent cells instead of
    # being silently missed.  Widening cells preserves the covering
    # guarantee (any within-radius pair is ≤ 1 cell apart).
    n_lon = max(1, int(360.0 // lon_cell_min)) if lon_cell_min < 360 else 1
    lon_cell_deg = 360.0 / n_lon
    return (
        df.withColumn(
            "_cla", F.floor(F.col(lat) / lat_cell_deg).cast("bigint")
        ).withColumn(
            "_clo",
            F.pmod(
                F.floor(F.col(lon) / lon_cell_deg), F.lit(n_lon)
            ).cast("bigint"),
        ),
        lat_cell_deg,
        lon_cell_deg,
        n_lon,
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = 66.0,
    dist_col: str = "dist_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``, with the rounded
    distance appended as ``dist_col``.

    ``max_abs_lat`` bounds the latitudes the blocking must stay
    radius-covering for (longitude degrees shrink with cos(lat); the
    default covers ±66°).  Points beyond it would need wider cells —
    raise the bound rather than silently under-join.  Column names are
    suffixed ``_l`` / ``_r`` in the output.
    """
    l, lat_deg, lon_deg, n_lon = _with_cells(
        left, lat, lon, radius_km, max_abs_lat
    )
    r, _, _, _ = _with_cells(right, lat, lon, radius_km, max_abs_lat)
    d3 = F.array(F.lit(-1), F.lit(0), F.lit(1))
    # lon neighbors wrap modulo n_lon (antimeridian adjacency);
    # array_distinct keeps each (row, cell) candidate unique when
    # n_lon ≤ 3 would otherwise alias offsets onto the same cell
    lon_nbrs = F.array_distinct(
        F.transform(
            d3, lambda d: F.pmod(F.col("_clo") + d, F.lit(n_lon))
        )
    )
    l = (
        l.withColumn("_da", F.explode(d3))
        .withColumn("_cla", F.col("_cla") + F.col("_da"))
        .withColumn("_clo", F.explode(lon_nbrs))
        .drop("_da")
    )
    lcols = [
        F.col(f"l.{c}").alias(f"{c}_l")
        for c in left.columns
    ]
    rcols = [
        F.col(f"r.{c}").alias(f"{c}_r")
        for c in right.columns
    ]
    dist = F.round(
        haversine_km(
            F.col(f"l.{lat}"),
            F.col(f"l.{lon}"),
            F.col(f"r.{lat}"),
            F.col(f"r.{lon}"),
        ),
        3,
    )
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col("l._cla") == F.col("r._cla"))
            & (F.col("l._clo") == F.col("r._clo")),
        )
        .select(*lcols, *rcols, dist.alias(dist_col))
        .filter(F.col(dist_col) <= radius_km)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    radius_km: float,
    id_left: str,
    id_right: str,
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = 66.0,
    exclude_self: bool | None = None,
) -> DataFrame:
    """k nearest right-side neighbors per left row, searched within
    ``radius_km`` (the blocking bound): rank on the rounded distance
    with the right id as tiebreak.  Left rows whose k-th neighbor lies
    beyond the radius return fewer than k rows — escalate the radius
    for a guaranteed k (documented blocking contract, as q282).

    ``exclude_self`` drops pairs whose ids coincide.  Default (None):
    auto — exclude only for a self-join (``left is right``), because
    for two DIFFERENT tables an id collision across the two id domains
    is a legitimate neighbor, not a self-pair.  Pass True/False to
    override."""
    from pyspark.sql.window import Window

    if exclude_self is None:
        exclude_self = left is right
    pairs = radius_join(
        left, right, radius_km, lat=lat, lon=lon,
        max_abs_lat=max_abs_lat,
    )
    if exclude_self:
        pairs = pairs.filter(
            F.col(f"{id_left}_l") != F.col(f"{id_right}_r")
        )
    w = Window.partitionBy(f"{id_left}_l").orderBy(
        F.col("dist_km").asc(), F.col(f"{id_right}_r").asc()
    )
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
