"""Deterministic synthetic `pages` table per BASELINE.json input_hint:
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string).

Every column is a pure function of (seed, row_id) so any scale can be
regenerated shard-by-shard with no coordination — the property that makes
the 100 TB version embarrassingly parallel. Coordinates are embedded in the
text ("located at {lat}, {lon}") so the geocode stage does real parsing;
~5% of rows carry no coordinate (geocode miss) and ~1% are malformed.
Point distribution = 70% uniform sphere + 30% hot-cluster caps (cities) to
exercise skew handling, mirroring S2Testing.randomPoint / samplePoint
(reference test/s2/s2testing.d:320-385).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LANGS = np.array(["en", "de", "fr", "ja", "pt"])

# Hot-cluster centers (lat, lon, cap radius in radians) — a few "cities".
HOT_CAPS = np.array([
    (48.8566, 2.3522, 0.002),
    (40.7128, -74.0060, 0.002),
    (35.6762, 139.6503, 0.002),
    (-23.5505, -46.6333, 0.003),
    (51.5072, -0.1276, 0.001),
])

_EPOCH_US = np.int64(1_600_000_000) * 1_000_000  # 2020-09-13T12:26:40Z


def _mix64(x):
    """splitmix64 finalizer — deterministic per-row hash (uint64 in/out)."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _unit(h, lo=0.0, hi=1.0):
    """uint64 hash -> float64 in [lo, hi)."""
    return lo + (hi - lo) * (h.astype(np.float64) / 2.0 ** 64)


def latlon_for_rows(row_ids, seed=42):
    """Deterministic (lat, lon) per row id; 70/30 uniform/hot mixture."""
    rid = np.asarray(row_ids, dtype=np.uint64)
    h1 = _mix64(rid ^ np.uint64(seed))
    h2 = _mix64(rid ^ np.uint64(seed + 1))
    h3 = _mix64(rid ^ np.uint64(seed + 2))
    # Uniform sphere: lon uniform, sin(lat) uniform.  asin is written as
    # atan2(z, sqrt(1-z^2)) because numpy's arcsin and DuckDB's asin
    # differ in the last ulp, while atan2/sqrt are bit-identical across
    # both — this keeps the whole generator replayable in the SQL oracle
    # (see pipelines/geo_queries._spatial_join_sql).
    u_lon = _unit(h1, -180.0, 180.0)
    z = _unit(h2, -1.0, 1.0)
    u_lat = np.rad2deg(np.arctan2(z, np.sqrt(1.0 - z * z)))
    # Hot clusters: small offsets around a city center.
    k = (h1 % np.uint64(len(HOT_CAPS))).astype(np.int64)
    c = HOT_CAPS[k]
    r = c[:, 2] * np.sqrt(_unit(h2))
    theta = _unit(h3, 0.0, 2 * np.pi)
    hot_lat = c[:, 0] + np.rad2deg(r) * np.cos(theta)
    hot_lon = c[:, 1] + np.rad2deg(r) * np.sin(theta) / \
        np.maximum(0.1, np.cos(np.deg2rad(c[:, 0])))
    is_hot = (_mix64(rid ^ np.uint64(seed + 3)) % np.uint64(100)) < 30
    lat = np.where(is_hot, hot_lat, u_lat)
    lon = np.where(is_hot, hot_lon, u_lon)
    lon = np.remainder(lon + 180.0, 360.0) - 180.0
    return np.clip(lat, -89.999, 89.999), lon


def make_pages_batch(batch, seed=42):
    """map_batches kernel: {'id': int64[n]} -> full pages arrow batch.

    Use with ray.data.range(n).map_batches(make_pages_batch,
    batch_format=\"numpy\") so generation itself is distributed.
    """
    import pyarrow.compute as pc

    rid = np.asarray(batch["id"], dtype=np.uint64)
    lat, lon = latlon_for_rows(rid, seed)
    h = _mix64(rid ^ np.uint64(seed + 4))
    kind = (h % np.uint64(100)).astype(np.int64)

    def _s(a):
        return pc.cast(pa.array(a), pa.string())

    def _fixed6(v):
        """%.6f as C++ kernels: sign + int part + '.' + 0-padded micros."""
        micro = np.round(v * 1e6).astype(np.int64)
        neg = micro < 0
        am = np.abs(micro)
        sign = pc.if_else(pa.array(neg), pa.scalar("-"), pa.scalar(""))
        ip = _s(am // 1_000_000)
        frac = pc.utf8_lpad(_s(am % 1_000_000), 6, "0")
        return pc.binary_join_element_wise(sign, ip, ".", frac, "")

    # 0-4 -> no coordinate; 5 -> malformed; else well-formed.
    join = pc.binary_join_element_wise
    urls = join("https://host", _s(rid.astype(np.int64) % 1000),
                ".example/", _s(rid.astype(np.int64)), "")
    lat_s = _fixed6(lat)
    lon_s = _fixed6(lon)
    miss = join("page ", urls,
                " with no location mentioned in its body text", "")
    malformed = join("page ", urls, " located at ", lat_s,
                     ", not-a-number", "")
    good = join("crawl snapshot of ", urls, " located at ", lat_s, ", ",
                lon_s, " with body text", "")
    texts = pc.if_else(pa.array(kind < 5), miss,
                       pc.if_else(pa.array(kind == 5), malformed, good))
    html = pc.cast(join("<html><body>", texts, "</body></html>", ""),
                   pa.binary())
    ts = (_EPOCH_US + rid.astype(np.int64)).view(np.int64)
    return pa.table({
        "url": urls,
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": html,
        "text": texts,
        "lang": pa.array(LANGS[(h % np.uint64(5)).astype(np.int64)]),
    })


def pages_dataset(n_rows, seed=42, override_num_blocks=None):
    """Distributed pages Dataset: range -> map_batches(generator).

    Block count is sized so batches are tens of thousands of rows — the
    default range() blocking would hand each map task a few hundred rows
    and per-batch overhead would dominate."""
    import ray.data as rd
    if override_num_blocks is None:
        try:
            import ray
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        override_num_blocks = max(2 * ncpu, min(512, n_rows // 32768) or 1)
    ds = rd.range(n_rows, override_num_blocks=override_num_blocks)
    return ds.map_batches(lambda b: make_pages_batch(b, seed),
                          batch_format="numpy", batch_size=65536)


def pages_table(n_rows, seed=42):
    """Driver-side small table for unit tests."""
    return make_pages_batch({"id": np.arange(n_rows, dtype=np.uint64)}, seed)
