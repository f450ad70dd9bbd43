"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry at a given scale factor, runs the matching
``oracle_sql()`` in DuckDB over the same parquet files, and compares:
row count, schema (column names, sorted), and values (exact, with a
float-tolerance fallback reported separately). Use while iterating:

    python tools/oracle_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata is one file per table; Spark-written datasets
        # (e.g. tools/scale_probe replicas) are directories of parts
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if df.empty:
        return df.reset_index(drop=True)
    # canonical row order for comparison
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count {len(spark_pdf)} vs {len(duck_pdf)}"
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return False, f"schema {s_cols} vs {d_cols}"
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    worst = 0.0
    for c in s.columns:
        sv, dv = s[c], d[c]
        # The driver's value hash distinguishes int 302 from float 302.0 —
        # an int-vs-float dtype divergence (e.g. DuckDB HUGEINT from
        # SUM(CASE...) vs Spark BIGINT) must FAIL here too, never be
        # coerced away. CAST the oracle SQL instead (see VERDICT r1 #1).
        s_kind, d_kind = sv.dtype.kind, dv.dtype.kind
        if (s_kind in "iu") != (d_kind in "iu") and {s_kind, d_kind} <= set("iufc"):
            return False, (
                f"col {c}: dtype kind mismatch {sv.dtype} vs {dv.dtype} "
                "(int-vs-float — driver hash will fail; CAST the oracle SQL)"
            )
        if sv.dtype.kind in "fc" or dv.dtype.kind in "fc":
            sv = sv.astype(float).to_numpy()
            dv = dv.astype(float).to_numpy()
            both_nan = np.isnan(sv) & np.isnan(dv)
            exact = np.array_equal(
                np.nan_to_num(sv, nan=0.0), np.nan_to_num(dv, nan=0.0)
            ) and np.array_equal(np.isnan(sv), np.isnan(dv))
            if not exact:
                diff = np.abs(sv - dv)
                diff[both_nan] = 0
                rel = diff / np.maximum(np.abs(dv), 1e-12)
                m = np.nanmax(np.minimum(diff, rel)) if len(diff) else 0.0
                worst = max(worst, float(m))
                if not np.all((diff <= 1e-9) | (rel <= 1e-9)):
                    bad = int(np.argmax(np.minimum(diff, rel)))
                    return False, (
                        f"col {c}: value mismatch at canon-row {bad}: "
                        f"{sv[bad]!r} vs {dv[bad]!r} (maxdiff {m:.3e})"
                    )
        else:
            sv = sv.astype(str)
            dv = dv.astype(str)
            if not sv.equals(dv):
                bad = (sv != dv).idxmax()
                return False, f"col {c}: {sv[bad]!r} vs {dv[bad]!r}"
    if worst > 0:
        return True, f"FLOAT-FUZZY (max rel/abs diff {worst:.3e}) — not bit-exact!"
    return True, "exact"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    from ig_etl_with_user_reports_2024_spark.operators.dedup import (
        release_eager_pins,
    )

    spark = get_spark("oracle_check")
    con = duck_connect(args.sf)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # result is fully collected (or failed) — free the query's
            # eager localCheckpoint blocks so a 200-entry gate run does
            # not accumulate every query's pinned stores on the heap
            release_eager_pins()
        if name not in oracles:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spdf, dpdf)
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        print(f"{status}  {name}: {len(spdf)} rows, {msg} [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
