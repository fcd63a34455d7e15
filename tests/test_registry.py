"""Run-registry memoization semantics (SURVEY.md §4): cache hit on
identical (operator, params, input), recompute on any change, lineage
parameter resolution — the ``assay.py:400-478`` contract."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from scarf_spark.catalog import DataStore
from scarf_spark.plans import RunRegistry, params_hash, selection_hash


@pytest.fixture()
def reg(spark):
    d = tempfile.mkdtemp(prefix="scarf_reg_")
    yield RunRegistry(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def test_cache_hit_skips_recompute(spark, sf_dir, reg):
    counts = DataStore(spark, sf_dir).counts()
    calls = []

    def compute():
        calls.append(1)
        return counts.groupBy("cell_id").agg(F.sum("value").alias("n_counts"))

    a = reg.get_or_compute("ncounts", {"sf": 1000}, "ih1", compute)
    b = reg.get_or_compute("ncounts", {"sf": 1000}, "ih1", compute)
    assert len(calls) == 1
    assert a.count() == b.count()


def test_param_or_input_change_recomputes(spark, sf_dir, reg):
    counts = DataStore(spark, sf_dir).counts()
    calls = []

    def compute():
        calls.append(1)
        return counts.limit(5)

    reg.get_or_compute("op", {"k": 1}, "ih1", compute)
    reg.get_or_compute("op", {"k": 2}, "ih1", compute)  # params changed
    reg.get_or_compute("op", {"k": 2}, "ih2", compute)  # input changed
    assert len(calls) == 3


def test_selection_hash_order_independent(spark, sf_dir):
    cells = DataStore(spark, sf_dir).cell_table().select("cell_id")
    h1 = selection_hash(cells)
    h2 = selection_hash(cells.orderBy(F.desc("cell_id")).repartition(7))
    assert h1 == h2
    h3 = selection_hash(cells.limit(50))
    assert h3 != h1


def test_params_hash_stable():
    assert params_hash({"a": 1, "b": "x"}) == params_hash({"b": "x", "a": 1})
    assert params_hash({"a": 1}) != params_hash({"a": 2})


def test_resolve_params_lineage(spark, sf_dir, reg):
    counts = DataStore(spark, sf_dir).counts()
    reg.get_or_compute("graph", {"k": 21, "dims": 15}, "ih", lambda: counts.limit(1))
    # None fills from the latest run, not from defaults
    got = reg.resolve_params(
        "graph", {"k": None, "dims": None}, defaults={"k": 11, "dims": 11}
    )
    assert got == {"k": 21, "dims": 15}
    # no prior run -> defaults
    got2 = reg.resolve_params("fresh", {"k": None}, defaults={"k": 11})
    assert got2 == {"k": 11}


def test_concurrent_publish_loses_race_gracefully(spark, reg):
    # a second cold-start builder must not clobber a table a reader
    # already holds: the build lands in a private dir and the rename
    # loser discards its copy (same atomic-publish rule as the /tmp
    # fixture stores)
    import glob
    import os

    df = spark.range(10).withColumnRenamed("id", "v")
    a = reg.get_or_compute("op", {"k": 1}, "ih1", lambda: df)
    # simulate the loser: wipe the metadata log so lookup misses, but
    # leave the committed table in place — the recompute must rename-
    # fail, keep the winner's files, and still return valid data
    os.remove(reg._log)
    b = reg.get_or_compute("op", {"k": 1}, "ih1", lambda: df)
    assert sorted(r["v"] for r in b.collect()) == list(range(10))
    assert a.count() == 10  # winner's table untouched
    assert not glob.glob(os.path.join(reg.root, "*build*"))


def test_rename_loser_does_not_duplicate_log_row(spark, reg):
    # r13 ADVICE: the rename loser used to append a second registry
    # row for the same key (the log grew one row per lost race and
    # latest() reflected the loser's timestamp). Emulate a lost race
    # where the winner's table AND its log row exist: wipe the log so
    # the first call recomputes and loses the rename against the
    # committed table — it must adopt it and append exactly one row
    # (the winner-crashed-before-logging case); a second identical
    # lost race with the row present must NOT append another.
    import os

    df = spark.range(10).withColumnRenamed("id", "v")
    reg.get_or_compute("op", {"k": 1}, "ih1", lambda: df)
    os.remove(reg._log)
    reg.get_or_compute("op", {"k": 1}, "ih1", lambda: df)  # adopts, logs once
    assert len(reg._entries()) == 1
    # row present + table complete: pure hit, no recompute, no append
    reg.get_or_compute("op", {"k": 1}, "ih1", lambda: df)
    assert len(reg._entries()) == 1


def test_stale_partial_with_log_row_recomputes(spark, reg):
    # r13 ADVICE: lookup() must not serve a path whose _SUCCESS marker
    # is missing even when a registry row for it exists
    import os

    df = spark.range(7).withColumnRenamed("id", "v")
    out = reg.get_or_compute("op", {"k": 3}, "ih3", lambda: df)
    path = reg.latest("op")["path"]
    os.remove(os.path.join(path, "_SUCCESS"))  # now a stale partial
    calls = []

    def compute():
        calls.append(1)
        return df

    out2 = reg.get_or_compute("op", {"k": 3}, "ih3", compute)
    assert calls == [1]  # fell through to recompute (repair)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert sorted(r["v"] for r in out2.collect()) == list(range(7))
    del out


def test_fixture_locks_are_keyed_per_target():
    # r13 ADVICE: the fixture stores used one global lock, serializing
    # unrelated families (zarr vs h5 vs jsonl) under the 4-thread
    # bench stream and risking self-deadlock on cross-family nesting
    import __spark_entry__ as em

    a = em._fixture_lock("/tmp/fixture_a")
    b = em._fixture_lock("/tmp/fixture_b")
    assert a is not b
    assert em._fixture_lock("/tmp/fixture_a") is a


def test_orphan_build_dirs_swept_only_when_pid_dead(spark, reg):
    import os

    df = spark.range(3).withColumnRenamed("id", "v")
    key = f"op__{params_hash({'k': 4})}__ih4"
    # r14 ADVICE: pid 999999 can be LIVE (pid_max defaults to 4194304
    # on modern kernels) — use a pid past pid_max, guaranteed dead
    try:
        with open("/proc/sys/kernel/pid_max") as fh:
            dead_pid = int(fh.read().strip()) + 1
    except OSError:
        dead_pid = 2**22 + 1
    dead = os.path.join(reg.root, f"{key}.build.{dead_pid}.1")
    live = os.path.join(reg.root, f"{key}.build.{os.getpid()}.1")
    os.makedirs(dead)
    os.makedirs(live)
    reg.get_or_compute("op", {"k": 4}, "ih4", lambda: df)
    assert not os.path.exists(dead)  # pid > pid_max is dead -> swept
    assert os.path.exists(live)  # our own pid is alive -> kept
    shutil.rmtree(live, ignore_errors=True)


def test_stale_partial_output_is_replaced(spark, reg):
    # a crashed pre-fix write (directory without _SUCCESS) must not
    # block the fresh build
    import glob
    import os

    p = os.path.join(reg.root, f"op__{params_hash({'k': 2})}__ih9")
    os.makedirs(p)  # partial: no _SUCCESS, no data
    df = spark.range(5).withColumnRenamed("id", "v")
    out = reg.get_or_compute("op", {"k": 2}, "ih9", lambda: df)
    assert sorted(r["v"] for r in out.collect()) == list(range(5))
    assert os.path.exists(os.path.join(p, "_SUCCESS"))
    assert not glob.glob(os.path.join(reg.root, "*build*"))
    assert not glob.glob(os.path.join(reg.root, "*stale*"))
