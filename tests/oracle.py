"""Local mirror of the driver's DuckDB-oracle comparison: same views,
order-insensitive, column-name-sorted, exact values (our plans are
engineered to be FP-deterministic — see functions/numeric.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            df[c] = col.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.astype("float64")
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("int64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), f"{name}: columns {list(s.columns)} != {list(o.columns)}"
    assert len(s) == len(o), f"{name}: rowcount {len(s)} != {len(o)}"
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = sv.to_numpy(dtype="float64").copy()
            b = ov.to_numpy(dtype="float64").copy()
            # BIT-level equality, not ==: the driver value-hashes raw
            # bytes, so -0.0 vs +0.0 is a driver mismatch even though
            # -0.0 == +0.0 (exactly how the r08 m12 red row slipped past
            # this mirror).  NaNs are canonicalized to the quiet-NaN bit
            # pattern on BOTH sides first: an x86 0.0/0.0 yields -NaN
            # (0xfff8...) while NULL→NaN conversion yields +NaN
            # (0x7ff8...), so two semantically-equal NaN results could
            # otherwise raise a false bit mismatch.  Only genuine
            # value-vs-value (or NaN-vs-number) differences fail.
            a[np.isnan(a)] = np.nan
            b[np.isnan(b)] = np.nan
            same = a.view(np.int64) == b.view(np.int64)
            if not same.all():
                bad = np.flatnonzero(~same)[:5]
                diffs = [(int(i), a[i], b[i], abs(a[i] - b[i])) for i in bad]
                raise AssertionError(f"{name}: column {c} differs (idx, spark, oracle, absdiff): {diffs}")
        else:
            if not sv.equals(ov):
                bad = sv[sv.ne(ov) & ~(sv.isna() & ov.isna())].index[:5]
                raise AssertionError(
                    f"{name}: column {c} differs at rows {list(bad)}: "
                    f"spark={sv.loc[bad].tolist()} oracle={ov.loc[bad].tolist()}"
                )
