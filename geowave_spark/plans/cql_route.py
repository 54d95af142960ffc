"""CQL-string queries routed through the cost-based index planner.

The reference's flow (`CQLQuery.java:59-100`): parse CQL once, extract a
geometry constraint and a temporal constraint from the filter tree, build a
Spatial/SpatialTemporal/Temporal base query that drives index-range pruning,
and re-verify every scanned row with the full CQL filter.  This module is
that flow over the engine's layouts:

- both constraints bounded -> the existing cost-based chooser
  (`plans/index_select.py`, `ChooseBestMatchIndexQueryStrategy` analog)
  picks 2D-tiered vs 3D-spatio-temporal and scans that layout's key ranges;
- spatial only -> the 2D tiered layout (the 3D layout is a full scan when
  any of its dimensions is unbounded — `isFullTableScan` in the reference);
- temporal only / neither -> full scan (the engine has no temporal-only
  layout, same as a reference store with only a spatial index);
- in every case the compiled CQL ``Column`` re-verifies rows, so the OUTPUT
  is route-independent — pinned by tests that run the same string down every
  route.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame

from geowave_spark.functions.cql import (
    CqlBinding,
    extract_bbox,
    extract_time_range,
    parse_cql,
    to_column,
)


def cql_routed_query(
    pts: DataFrame,
    cql: str,
    xy_bits: int = 10,
    t_bits: int = 10,
    ts_col: str = "event_ts",
    binding: CqlBinding = CqlBinding(),
    layouts: dict | None = None,
    bias: str | None = None,
) -> tuple[DataFrame, str]:
    """CQL string in -> (exact rows, route taken).

    Route is one of ``spatial_2d`` / ``spatiotemporal_3d`` /
    ``spatiotemporal_biased`` (when ``bias`` or bias-carrying ``layouts``
    are given) / ``full_scan``; whatever the route, the result equals
    ``pts.filter(to_column(ast))``.
    """
    ast = parse_cql(cql)
    fine = to_column(ast, binding)
    bbox = extract_bbox(ast)
    trange = extract_time_range(ast, ts_attrs={ts_col})

    if bbox is None or _degenerate(bbox):
        return pts.filter(fine), "full_scan"

    if layouts is None and bias is not None:
        from geowave_spark.plans.index_select import layouts_for

        layouts = layouts_for(pts, xy_bits, t_bits, bias=bias, ts_col=ts_col)

    if trange is not None:
        from geowave_spark.plans.index_select import routed_points_query

        # the extracted hull is CLOSED [t0, t1]; the router's windows treat
        # ts_hi as exclusive, so pad by 1ms to stay over-inclusive (TEQUALS
        # collapses to a point range otherwise) — the fine filter re-applies
        # the exact boundary semantics
        return routed_points_query(
            pts,
            bbox,
            trange[0],
            trange[1] + dt.timedelta(milliseconds=1),
            xy_bits=xy_bits,
            t_bits=t_bits,
            ts_col=ts_col,
            layouts=layouts,
            refine=fine,
        )

    # spatial-only: scan the 2D tiered layout's key ranges
    from pyspark.sql import functions as F

    from geowave_spark.plans.index_select import layouts_for
    from geowave_spark.sfc.tiered import decompose_query_ranges

    if layouts is None:
        layouts = layouts_for(pts, xy_bits, t_bits, ts_col=ts_col)
    cfg = layouts["cfg"]
    flat = layouts["flat"]
    minx, miny, maxx, maxy = bbox
    pred = None
    for lo, hi in decompose_query_ranges(minx, miny, maxx, maxy, xy_bits, 64, cfg):
        p = (F.col("_cell2d") >= lo) & (F.col("_cell2d") <= hi)
        pred = p if pred is None else (pred | p)
    if pred is None:
        return pts.filter(fine), "full_scan"
    return flat.filter(pred).filter(fine), "spatial_2d"


def cql_areal_routed_query(
    indexed: DataFrame,
    cql: str,
    binding: CqlBinding | None = None,
    id_col: str = "doc_id",
    cfg=None,
    max_ranges_per_tier: int = 16,
) -> tuple[DataFrame, str]:
    """CQL against a tiered-indexed EXTENT table (the ``ingest_extents`` /
    ``write_indexed`` layout: ``tier`` partition column, ``cell`` insertion
    keys, ``num_duplicates``) — the reference's CQL-over-feature-store path:
    extract the filter's envelope, prune each tier's cells with decomposed
    key ranges (tier dirs partition-prune, cell ranges row-group-prune on
    the sorted files), drop multi-cell duplicates (F5), re-verify with the
    full CQL column.  Correct because K1 insertion cells COVER each
    extent's bbox and K2 ranges cover every cell intersecting the query
    envelope at that tier — a qualifying extent always shares at least one
    (tier, cell) with the decomposition."""
    from pyspark.sql import functions as F

    from geowave_spark.sfc import DEFAULT_CONFIG
    from geowave_spark.sfc.tiered import decompose_query_ranges, normalize_lon_range

    cfg = cfg or DEFAULT_CONFIG
    binding = binding or CqlBinding(wkt_col="geom_wkt")
    ast = parse_cql(cql)
    fine = to_column(ast, binding)
    bbox = extract_bbox(ast)
    if bbox is None or _degenerate(bbox):
        return indexed.filter(fine).dropDuplicates([id_col]), "full_scan"
    minx, miny, maxx, maxy = bbox
    pred = None
    for t in cfg.tiers:
        tier_pred = None
        for lo_lon, hi_lon in normalize_lon_range(minx, maxx):
            for lo, hi in decompose_query_ranges(
                lo_lon, miny, hi_lon, maxy, bits=t, max_ranges=max_ranges_per_tier, cfg=cfg
            ):
                p = (F.col("cell") >= lo) & (F.col("cell") <= hi)
                tier_pred = p if tier_pred is None else (tier_pred | p)
        if tier_pred is not None:
            p = (F.col("tier") == t) & tier_pred
            pred = p if pred is None else (pred | p)
    routed = indexed.filter(pred) if pred is not None else indexed
    return routed.filter(fine).dropDuplicates([id_col]), "tiered_extent"


def _degenerate(bbox) -> bool:
    minx, miny, maxx, maxy = bbox
    return minx > maxx or miny > maxy
