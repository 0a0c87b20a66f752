"""Pre-validates the driver's correctness gate: run every queries() entry
at sf0.001 and compare row-count + sorted values against its oracle_sql()
via DuckDB, mimicking the driver's order-insensitive comparison."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res):
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("uint64", "uint32", "int32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_queries_match_oracle(sf_dir):
    import duckdb

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, sql in sorted(oracles.items()):
        got = _canon(_to_pandas(qs[name](sf_dir)))
        want = _canon(con.sql(sql).df())
        if list(got.columns) != list(want.columns):
            failures.append(f"{name}: columns {list(got.columns)} != "
                            f"{list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                ok = np.allclose(a.to_numpy(dtype=float),
                                 b.to_numpy(dtype=float),
                                 rtol=0, atol=1e-9, equal_nan=True)
            else:
                ok = (a.to_numpy() == b.to_numpy()).all()
            if not ok:
                bad = (a != b)
                failures.append(
                    f"{name}.{c}: {int(np.sum(bad))} mismatches, e.g. "
                    f"{a[bad].head(3).tolist()} vs {b[bad].head(3).tolist()}")
    assert not failures, "\n".join(failures)


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run(sf_dir):
    """Queries without an oracle must still run and return rows."""
    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        res = _to_pandas(qs[name](sf_dir))
        assert res is not None, name
        assert len(res.columns) > 0, name


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as entrymod
    res = _to_pandas(entrymod.entry())
    assert len(res) >= 0
    assert set(res.columns) == {"url", "polygon_id", "cell_id", "contained"}
