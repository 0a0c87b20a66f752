"""Geocode stage: parse "lat, lon" coordinates out of page text and encode
S2 cell ids + level-10..16 tile ancestors + tokens.

All kernels are Arrow-in/Arrow-out (batch_format="pyarrow",
zero_copy_batch) with pyarrow.compute regex extraction and the vectorized
numpy cellid kernels from core.cellid. The heavy `html` column must be
projected out BEFORE this stage (SURVEY.md §7 'wide rows')."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core import cellid as ci

COORD_PATTERN = (r"located at (?P<glat>-?[0-9]{1,3}\.[0-9]+), "
                 r"(?P<glon>-?[0-9]{1,3}\.[0-9]+)")

TILE_LEVELS = tuple(range(10, 17))


def parse_latlon(batch: pa.Table, text_col="text") -> pa.Table:
    """Extract lat/lon floats from the text column; rows without a valid
    coordinate get null lat/lon (geocode miss)."""
    ext = pc.extract_regex(batch[text_col], COORD_PATTERN)
    lat = pc.cast(pc.struct_field(ext, "glat"), pa.float64())
    lon = pc.cast(pc.struct_field(ext, "glon"), pa.float64())
    # Validity: |lat|<=90, |lon|<=180.
    lat_ok = pc.and_(pc.greater_equal(lat, -90.0), pc.less_equal(lat, 90.0))
    lon_ok = pc.and_(pc.greater_equal(lon, -180.0), pc.less_equal(lon, 180.0))
    ok = pc.and_(lat_ok, lon_ok)
    lat = pc.if_else(ok, lat, pa.scalar(None, pa.float64()))
    lon = pc.if_else(ok, lon, pa.scalar(None, pa.float64()))
    batch = batch.append_column("lat", lat)
    batch = batch.append_column("lon", lon)
    return batch


def encode_cells(batch: pa.Table, levels=TILE_LEVELS,
                 with_token=True) -> pa.Table:
    """Add cell_id (leaf) + cell_l{k} ancestor columns + token.

    Rows with null lat/lon get cell_id = 0 (invalid sentinel)."""
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    valid = ~(np.isnan(lat) | np.isnan(lon))
    leaf = np.zeros(len(lat), dtype=np.uint64)
    if valid.any():
        leaf[valid] = ci.cellid_from_latlng(lat[valid], lon[valid])
    batch = batch.append_column("cell_id", pa.array(leaf, pa.uint64()))
    for lvl in levels:
        anc = np.zeros_like(leaf)
        if valid.any():
            anc[valid] = ci.parent(leaf[valid], lvl)
        batch = batch.append_column(f"cell_l{lvl}", pa.array(anc, pa.uint64()))
    if with_token:
        tok = np.empty(len(leaf), dtype=object)
        tok[:] = ""
        if valid.any():
            tok[valid] = ci.to_token(leaf[valid])
        batch = batch.append_column("token", pa.array(tok, pa.string()))
    return batch


def geocode_and_encode(batch: pa.Table, levels=TILE_LEVELS) -> pa.Table:
    return encode_cells(parse_latlon(batch), levels)


def drop_misses(batch: pa.Table) -> pa.Table:
    """Filter out geocode misses (cell_id == 0)."""
    return batch.filter(pc.not_equal(batch["cell_id"], pa.scalar(0, pa.uint64())))
