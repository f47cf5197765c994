"""Python-worker daemon with mtime-guarded zip import-cache invalidation.

Every Python-worker task runs ``setup_spark_files`` → ``importlib.
invalidate_caches()`` (pyspark ``worker_util.py``). On CPython 3.11+,
``zipimport.zipimporter.invalidate_caches()`` *eagerly re-reads the whole
zip central directory* on every call — and the worker's ``sys.path`` holds
``pyspark.zip`` (~1,400 entries) plus the py4j zip, so every
mapInPandas/pandas-UDF task pays the re-parse even though the archives
never change. Measured on this host: **~180 ms per task** (p90 400 ms) of
pure import-cache churn, dominating short tasks (a 128-task extraction
stage spent more wall time invalidating zip caches than running the UDF).

This daemon module (``spark.python.daemon.module`` — the documented
extension point for customizing worker startup) is a thin wrapper around
the stock ``pyspark.daemon`` that first replaces
``zipimporter.invalidate_caches`` with a *correctness-preserving* guard:
the archive directory is re-read only when the zip file's
``(mtime, size)`` actually changed — exactly the condition under which
the cached directory could be stale. Everything else about
``invalidate_caches`` (FileFinder directory caches, namespace-path
epochs) is untouched, so ``sc.addPyFile``/``--py-files`` semantics are
preserved: new files land in directories (FileFinder, cheap mtime-checked
invalidation) or as *new* zip path entries (fresh zipimporter, read once).

Scope: wired up by ``plans/session.py`` for ``local[*]`` masters only —
the daemon must be importable from the worker's *environment* PYTHONPATH,
which local mode inherits from the driver. On a cluster, ship the package
on ``spark.executorEnv.PYTHONPATH`` and set
``spark.python.daemon.module=norsk_historisk_avis_ocr_spark.zipcache_daemon``
explicitly.
"""

from __future__ import annotations

import os
import zipimport

_orig_invalidate = zipimport.zipimporter.invalidate_caches


def _guarded_invalidate(self):
    try:
        st = os.stat(self.archive)
        key = (st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    if key is not None and getattr(self, "_nhao_zip_stat", None) == key:
        return  # archive unchanged: the cached directory cannot be stale
    _orig_invalidate(self)
    self._nhao_zip_stat = key


def _install() -> None:
    zipimport.zipimporter.invalidate_caches = _guarded_invalidate
    # Warm the guard in the daemon parent: forked workers inherit the
    # already-validated cache state, so not even the first task of a fresh
    # worker pays a re-read.
    import importlib
    importlib.invalidate_caches()


if __name__ == "__main__":
    _install()
    from pyspark.daemon import manager
    manager()
