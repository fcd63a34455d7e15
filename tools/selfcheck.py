"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, sorts columns by name, sorts rows, and
compares values (exact for ints/strings, tiny-eps for floats — the real
driver hashes, so we aim for exact equality of the rounded values and
report max float deviation).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from scarf_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify timestamps for stable compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def type_audit(con: duckdb.DuckDBPyConnection, name: str, sql: str,
               spark_dtypes: dict[str, str]) -> str | None:
    """The driver's value-hash is serialization-sensitive: DuckDB
    HUGEINT (int128 from SUM(int)) vs Spark BIGINT hash-mismatches even
    when every value is equal (all six r6 reds). Catch type-class
    divergence locally: FAIL if the wrapped oracle still DESCRIBEs a
    HUGEINT column, or an oracle int column pairs with a Spark float
    column (or vice versa). Compares against the SPARK SQL schema
    (df.dtypes), not pandas dtypes — toPandas turns nullable int64
    into float64, which is not a serialization difference."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return None  # the execute path will report the real error
    int_like = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
                "USMALLINT", "UINTEGER", "UBIGINT"}
    for c, t, *_ in desc:
        t = t.upper()
        if t in ("HUGEINT", "UHUGEINT"):
            return f"col {c}: oracle emits {t} (driver hash != Spark BIGINT)"
        sdt = spark_dtypes.get(c, "")
        if sdt in ("float", "double") and t in int_like:
            return f"col {c}: oracle {t} vs spark {sdt} (int/float kind mismatch)"
        if sdt in ("tinyint", "smallint", "int", "bigint") and t in (
            "DOUBLE", "FLOAT", "REAL"
        ):
            return f"col {c}: oracle {t} vs spark {sdt} (float/int kind mismatch)"
    return None


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_pdf) != len(duck_pdf):
        return False, f"rowcount {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    max_dev = 0.0
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            nan_a, nan_b = np.isnan(av), np.isnan(bv)
            if not (nan_a == nan_b).all():
                return False, f"col {c}: nan mismatch"
            # driver hashes bytes: -0.0 vs +0.0 is a real mismatch
            sz = np.signbit(av) != np.signbit(bv)
            sz &= (av == 0) & (bv == 0)
            if sz.any():
                return False, f"col {c}: signed-zero mismatch ({int(sz.sum())} rows)"
            dev = np.abs(av[~nan_a] - bv[~nan_b])
            d = float(dev.max()) if dev.size else 0.0
            max_dev = max(max_dev, d)
            if d > 0:
                exact = (av[~nan_a] == bv[~nan_b]).mean()
                if d > 1e-9:
                    return False, f"col {c}: max dev {d:.3g} (exact frac {exact:.4f})"
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                i = int(np.argmax(av.astype(str) != bv.astype(str)))
                return False, f"col {c}: value mismatch at sorted row {i}: {av[i]!r} vs {bv[i]!r}"
    note = "exact" if max_dev == 0 else f"float max dev {max_dev:.2g}"
    return True, note


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))
    # Per-side time-box for larger-SF sweeps (SELFCHECK_TIMEOUT_S,
    # default off): oracles that are exact-but-slow in DuckDB at
    # sf0.1 (unrolled trace replays, pair-explosive range joins) are
    # recorded as SKIP with the reason, never silently dropped — the
    # point of the sweep is an explicit ledger of what was and wasn't
    # value-checked at this SF.
    timeout_s = float(os.environ.get("SELFCHECK_TIMEOUT_S", "0") or 0)
    spark = get_spark("selfcheck")
    con = duck_con(sf_dir)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    skips: list[str] = []

    # Cancellation is detected POSITIVELY: the Timer callback sets the
    # flag BEFORE cancelling/interrupting, and the except paths check
    # the flag — not elapsed time or an 'INTERRUPT' message substring,
    # either of which would record a genuine engine/oracle failure that
    # happens to surface near the deadline as SKIP instead of FAIL.
    cancelled = {"spark": False, "duck": False}

    def spark_collect(name, fn):
        """fn() under a cancellable job group when time-boxed."""
        import threading

        cancelled["spark"] = False
        if not timeout_s:
            return fn()
        sc = spark.sparkContext
        gid = f"selfcheck-{name}"
        sc.setJobGroup(gid, "selfcheck timebox", interruptOnCancel=True)

        def _cancel():
            cancelled["spark"] = True
            sc.cancelJobGroup(gid)

        timer = threading.Timer(timeout_s, _cancel)
        timer.start()
        try:
            return fn()
        finally:
            timer.cancel()

    def duck_fetch(sql):
        import threading

        cancelled["duck"] = False
        if not timeout_s:
            return con.execute(sql).fetchdf()

        def _cancel():
            cancelled["duck"] = True
            con.interrupt()

        timer = threading.Timer(timeout_s, _cancel)
        timer.start()
        try:
            return con.execute(sql).fetchdf()
        finally:
            timer.cancel()

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()

        def _build(fn=fn):
            # plan construction included: driver-loop queries (harmony,
            # kmeans) do eager work before toPandas
            df = fn(spark, sf_dir)
            return dict(df.dtypes), df.toPandas()

        try:
            spark_types, sdf = spark_collect(name, _build)
        except Exception as e:
            if cancelled["spark"]:
                print(f"SKIP {name}: spark timebox {timeout_s:.0f}s")
                skips.append(f"{name} (spark > {timeout_s:.0f}s)")
                continue
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        t1 = time.time()
        try:
            ddf = duck_fetch(oracles[name])
        except Exception as e:
            if cancelled["duck"]:
                print(f"SKIP {name}: oracle timebox {timeout_s:.0f}s "
                      f"(spark rows={len(sdf)})")
                skips.append(f"{name} (duckdb oracle > {timeout_s:.0f}s)")
                continue
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok, note = compare(sdf, ddf)
        if ok:
            terr = type_audit(con, name, oracles[name], spark_types)
            if terr:
                ok, note = False, f"type audit: {terr}"
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: rows={len(sdf)} {note} [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    tail = f", {len(skips)} skipped (time-boxed)" if skips else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only){tail}")
    for s in skips:
        print(f"  SKIPPED: {s}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
