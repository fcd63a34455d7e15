"""Run registry: params-hash memoization + lineage pointers.

Reproduces the reference's caching contract Spark-first:

* ``scarf/assay.py:316-377`` — ``_create_subset_hash`` hashes the
  (cell_idx, feat_idx) selection; ``save_normalized_data``
  (``assay.py:400-478``) recomputes only when the hash or params
  changed, else reuses the materialized array.
* ``scarf/datastore/graph_datastore.py:63-363`` — ``_set_graph_params``
  fills every ``None`` parameter from the *latest cached run's*
  path-encoded values; ``latest_*`` pointers
  (``graph_datastore.py:1003-1008``) name the last run per stage.

Spark shape: materialized parquet outputs under a warehouse dir, plus
a tiny driver-side JSONL metadata log (the registry itself is metadata
— a handful of rows, never big data; at cluster scale this would be a
Delta table, the append-only log is the same idea). Content hashes of
distributed selections use an order-independent aggregate of
``xxhash64`` so the hash never needs a sort or collect.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def params_hash(params: dict) -> str:
    """Stable hash of a parameter dict (sorted-key JSON, sha1/16)."""
    blob = json.dumps(params, sort_keys=True, default=str)
    return hashlib.sha1(blob.encode()).hexdigest()[:16]


def selection_hash(df: DataFrame, cols: list[str] | None = None) -> str:
    """Order-independent content hash of a selection DataFrame — the
    ``subset_hash`` of ``scarf/assay.py:316-345``. One distributed
    aggregate: sum + count of xxhash64 over the key columns; no sort,
    no collect, no Python per row."""
    cols = cols or df.columns
    h = F.xxhash64(*[F.col(c) for c in cols])
    # decimal(38,0) sum cannot overflow under ANSI at any realistic
    # row count; bit_xor adds a second order-independent mix
    row = df.agg(
        F.sum(h.cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(" + ", ".join(cols) + "))").alias("x"),
    ).collect()[0]
    return hashlib.sha1(
        f"{row['s']}:{row['n']}:{row['x']}".encode()
    ).hexdigest()[:16]


class RunRegistry:
    """Maps (operator, params_hash, input_hash) → materialized output.

    ``get_or_compute`` is the memoization gate every expensive stage
    goes through (normalize → reduce → ann → knn → graph in the
    reference lifecycle, SURVEY.md §3.2); ``latest`` is the lineage
    pointer that lets ``None`` params resolve to the previous run."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._log = os.path.join(root, "registry.jsonl")
        # serializes the adopt-append check (r14 ADVICE): two in-process
        # threads that both lost the publish rename could both observe
        # lookup() is None and each append a duplicate log row
        self._adopt_lock = threading.Lock()

    # ---- metadata log (tiny, driver-side by design) ----

    def _entries(self) -> list[dict]:
        if not os.path.exists(self._log):
            return []
        with open(self._log) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def _append(self, entry: dict) -> None:
        with open(self._log, "a") as fh:
            fh.write(json.dumps(entry) + "\n")

    # ---- memoization ----

    def lookup(self, operator: str, p_hash: str, input_hash: str) -> dict | None:
        for e in reversed(self._entries()):
            if (
                e["operator"] == operator
                and e["params_hash"] == p_hash
                and e["input_hash"] == input_hash
                # _SUCCESS is the completeness marker: a pre-fix stale
                # partial (crashed direct write) may still have a log
                # row and a directory — without the marker it falls
                # through to recompute, where the publish path repairs
                # it (r13 ADVICE).
                and os.path.exists(os.path.join(e["path"], "_SUCCESS"))
            ):
                return e
        return None

    def get_or_compute(
        self,
        operator: str,
        params: dict,
        input_hash: str,
        compute,
    ) -> DataFrame:
        """Return the cached materialization, else run ``compute()``,
        persist it, and register the run. Path encodes the identity the
        way the reference's Zarr tree encodes params in group names
        (``graph_datastore.py:738-745``)."""
        p_hash = params_hash(params)
        hit = self.lookup(operator, p_hash, input_hash)
        if hit is not None:
            return self.spark.read.parquet(hit["path"])
        out_path = os.path.join(
            self.root, f"{operator}__{p_hash}__{input_hash}"
        )
        df = compute()
        # Publish atomically: two cold-start processes (the driver's
        # gate alongside a local run — observed overlapping) may both
        # miss and both materialize; writing straight to out_path with
        # mode=overwrite would let one delete files a concurrent
        # reader already holds open. Write to a private build dir and
        # rename into place — the keyed output is deterministic, so
        # whichever build wins, readers see one complete table.
        import shutil
        import threading

        # Sweep orphaned build dirs from crashed runs (r13 ADVICE): a
        # builder that died mid-write leaves {out}.build.{pid}.{tid}
        # behind forever otherwise. Only dirs whose pid is dead — a
        # live concurrent builder keeps its private dir.
        import glob as _glob

        for orphan in _glob.glob(f"{out_path}.build.*"):
            try:
                pid = int(orphan.rsplit(".", 2)[-2])
                os.kill(pid, 0)
            except (ValueError, IndexError):
                continue
            except ProcessLookupError:
                # only a definitively-dead pid; PermissionError means
                # alive under another uid — leave it
                shutil.rmtree(orphan, ignore_errors=True)
            except OSError:
                continue

        build = f"{out_path}.build.{os.getpid()}.{threading.get_ident()}"
        try:
            df.write.mode("overwrite").parquet(build)
        except BaseException:
            shutil.rmtree(build, ignore_errors=True)
            raise
        published = False
        try:
            os.rename(build, out_path)
            published = True
        except OSError:
            marker = os.path.join(out_path, "_SUCCESS")
            if os.path.isdir(out_path) and not os.path.exists(marker):
                # stale partial from a pre-fix crashed write (a
                # completed write always has the committer's _SUCCESS
                # and, post-fix, only ever appears complete)
                aside = f"{out_path}.stale.{os.getpid()}"
                try:
                    os.rename(out_path, aside)
                    os.rename(build, out_path)
                    published = True
                except OSError:
                    pass
                shutil.rmtree(aside, ignore_errors=True)
            if not os.path.exists(out_path):
                raise
            shutil.rmtree(build, ignore_errors=True)
        # The rename LOSER does not append (r13 ADVICE: the log grew
        # one duplicate row per lost race and latest() reflected the
        # loser's timestamp) — unless the winner crashed before
        # logging, in which case the complete table exists with no
        # entry and we adopt it so future lookups hit. The adopt path
        # re-checks lookup() under a lock (r14 ADVICE: two in-process
        # rename losers could both see None and double-append) and only
        # for a table that is actually complete (_SUCCESS present —
        # never log a row for the rare swap-failure partial).
        entry = {
            "operator": operator,
            "params_hash": p_hash,
            "input_hash": input_hash,
            "params": {k: str(v) for k, v in params.items()},
            "path": out_path,
            "created": time.time(),
        }
        if published:
            self._append(entry)
        else:
            with self._adopt_lock:
                if self.lookup(
                    operator, p_hash, input_hash
                ) is None and os.path.exists(
                    os.path.join(out_path, "_SUCCESS")
                ):
                    self._append(entry)
        return self.spark.read.parquet(out_path)

    # ---- lineage ----

    def latest(self, operator: str) -> dict | None:
        """latest_* pointer (``graph_datastore.py:1003-1008``)."""
        for e in reversed(self._entries()):
            if e["operator"] == operator:
                return e
        return None

    def resolve_params(self, operator: str, params: dict, defaults: dict) -> dict:
        """``_set_graph_params`` semantics
        (``graph_datastore.py:139-149``): every None is filled from the
        latest cached run of this operator, else from defaults."""
        last = self.latest(operator)
        prev = last["params"] if last else {}
        out = {}
        for k, v in params.items():
            if v is not None:
                out[k] = v
            elif k in prev:
                out[k] = type(defaults[k])(prev[k]) if k in defaults else prev[k]
            else:
                out[k] = defaults[k]
        return out
