"""Dump `.explain("formatted")` of named queries to files.

Usage: python tools/dump_plan_one.py <out_dir> <suffix> <query> [...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Run from the
repo checkout whose plans you want (a git worktree of the previous
commit for the `before` side).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import contextlib
import io


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

    from scarf_spark.session import get_spark

    spark = get_spark("plan-dump")

    import __spark_entry__ as em
    from scarf_spark.catalog import DataStore

    ds = DataStore(spark, sf_dir)
    em._DS_CACHE[(spark.sparkContext.applicationId, sf_dir)] = ds
    qs = em.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN FAILED: {exc}\n"
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            fh.write(txt)
        print(f"wrote {p} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
