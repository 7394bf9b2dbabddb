"""Spatial bucketing + proximity self-join over integer micro-degree
coordinates.

The all-pairs distance join is the spatial analogue of all-pairs
similarity — and the fix is the same family of tricks this repo uses
everywhere: bucket the plane into radius-sized grid cells, generate
candidates ONLY from a cell-key equi-join (each point probes its 3×3
cell neighborhood — the pigeonhole guarantee: two points within
``radius`` can differ by at most one cell index per axis when the cell
edge >= radius), then verify with the exact integer predicate.  The
corpus side is never exploded: only the probe side fans out ×9, the
multi-probe shape ``phash_near_pairs`` established.

Coordinates are INTEGER MICRO-DEGREES (1e-6°, the OpenStreetMap /
telemetry wire convention) and the verify predicate is squared
planar distance in micro-degrees — exact int64 arithmetic, so results
are bit-identical cross-engine (a DuckDB oracle reproduces candidate
generation AND verification).  Planar distance on degrees is the
documented approximation: correct for the city-scale radii per-domain
telemetry uses; at continental radii or high latitudes callers should
scale the longitude axis by cos(lat) upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def geo_cell(lat_micro: Column, lon_micro: Column, cell_micro: int) -> Column:
    """Grid-cell id for a point: floor-div each axis by the cell edge
    and pack into one bigint (x * 2^32 + y, offset to stay positive).
    Floor division must round toward -inf for negative coordinates —
    both engines' integer ``//``/DIV truncate, so the offset (+180e6 /
    +90e6, making every value positive) is applied BEFORE the divide."""
    x = ((lon_micro + F.lit(180_000_000)) / F.lit(cell_micro)).cast("bigint")
    y = ((lat_micro + F.lit(90_000_000)) / F.lit(cell_micro)).cast("bigint")
    return (x * F.lit(1 << 32) + y).cast("bigint")


def proximity_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_micro: int,
) -> DataFrame:
    """All pairs of points within ``radius_micro`` (planar, integer
    micro-degrees): cell-bucket candidate generation + exact integer
    verify.  Returns ``(id_a, id_b, dist2)`` with id_a < id_b and
    dist2 the exact squared distance.

    Plan: build side keyed by its own cell (one shuffle); probe side
    explodes the 9 neighbor offsets (map-only ×9) and equi-joins on
    the cell key; verification is a filter.  Cell edge == radius, so a
    cell holds only points within one radius of each other — candidate
    count per cell is bounded by local density, never by n."""
    if radius_micro < 1:
        raise ValueError("radius_micro must be >= 1")
    cell = radius_micro
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).cast("bigint").alias("la"),
        F.col(lon_col).cast("bigint").alias("lo"),
    )
    build = pts.select(
        "pid", "la", "lo", geo_cell(F.col("la"), F.col("lo"), cell).alias("ck")
    )
    offsets = F.array(
        *[
            F.lit(dx * (1 << 32) + dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        F.col("pid").alias("qid"),
        F.col("la").alias("qla"),
        F.col("lo").alias("qlo"),
        F.explode(
            F.transform(
                offsets,
                lambda o: geo_cell(F.col("la"), F.col("lo"), cell) + o,
            )
        ).alias("ck"),
    )
    r2 = radius_micro * radius_micro
    return (
        probe.join(build, "ck")
        .filter(F.col("qid") < F.col("pid"))
        .select(
            F.col("qid").alias("id_a"),
            F.col("pid").alias("id_b"),
            (
                (F.col("qla") - F.col("la")) * (F.col("qla") - F.col("la"))
                + (F.col("qlo") - F.col("lo")) * (F.col("qlo") - F.col("lo"))
            ).cast("bigint").alias("dist2"),
        )
        .filter(F.col("dist2") <= F.lit(r2))
        # no dedup needed: for a pair (a < b), only a's probe of b's cell
        # passes the qid < pid filter, and a probes 9 DISTINCT cells, so
        # the pair is generated exactly once
    )
