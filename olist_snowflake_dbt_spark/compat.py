"""Optional-dependency probes.

The engine's hard dependencies are exactly the container baseline
(pyspark, pyarrow, pandas, numpy). A few Spark surfaces have optional
extras — ``transformWithStateInPandas``'s state-server protocol speaks
protobuf between the JVM and the Python worker — and this module makes
them usable when the package exists SOMEWHERE on the machine without
requiring an install into the running interpreter.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import tempfile
import zipfile


def _protobuf_importable() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


def _candidate_sites() -> list[str]:
    # ONLY the documented, operator-controlled opt-in: a colon-separated
    # list of site-packages dirs in $SPARK_GRAFT_PROTOBUF_SITE. The
    # library never probes the filesystem on its own — auto-importing
    # code from paths the operator didn't vet is a supply-chain hazard
    # (and machine-specific globs don't belong in library code). Any
    # env that ships protobuf works in pure-python mode — the fallback
    # implementation is version-independent pure .py (the ABI-specific
    # upb extension is deliberately NOT shipped to executors, so
    # protobuf's automatic python-impl fallback engages).
    return [
        p
        for p in os.environ.get("SPARK_GRAFT_PROTOBUF_SITE", "").split(":")
        if p
    ]


def export_protobuf_env() -> str | None:
    """Import-time half of the probe: when protobuf is missing but a
    local pure-python copy exists, put its site dir on ``PYTHONPATH``
    (and the driver's ``sys.path``) BEFORE any JVM starts. This is the
    only channel that reaches transformWithState's *driver-side* Python
    worker — a separate process the JVM launches with its own inherited
    environment, which ``addPyFile`` (executor-scoped) cannot touch.
    Called from the package ``__init__``; a no-op when protobuf is
    installed or nothing local provides it. Returns the site dir used."""
    if _protobuf_importable():
        return None
    for site in _candidate_sites():
        if not os.path.isdir(os.path.join(site, "google", "protobuf")):
            continue
        sys.path.append(site)
        if not _protobuf_importable():
            sys.path.remove(site)
            continue
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        os.environ["PYTHONPATH"] = (
            site + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
        return site
    return None


def ensure_protobuf(spark) -> bool:
    """Make ``google.protobuf`` importable on the driver AND the
    executors of an already-running session; return availability.

    - Already importable → True (a properly provisioned cluster).
    - Else probe ``$SPARK_GRAFT_PROTOBUF_SITE`` (colon-separated site
      dirs) and local python envs for a pure-python copy; on a hit,
      extend the driver's ``sys.path`` and ship ONLY the ``.py`` files
      as a zip via ``sparkContext.addPyFile`` — which reaches workers
      of a session that is already running, unlike PYTHONPATH (frozen
      into the worker daemon's environment at JVM launch).
    - Nothing found → False; callers should raise/skip with a clear
      message rather than let the stream fail at initialization.
    """
    if _protobuf_importable():
        return True
    for site in _candidate_sites():
        pkg = os.path.join(site, "google")
        if not os.path.isdir(os.path.join(pkg, "protobuf")):
            continue
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        sys.path.append(site)
        if not _protobuf_importable():
            sys.path.remove(site)
            continue
        zip_path = os.path.join(
            tempfile.gettempdir(), "spark_graft_protobuf_site.zip"
        )
        if not os.path.exists(zip_path):
            tmp = zip_path + ".tmp"
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
                for root, _dirs, files in os.walk(pkg):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            zf.write(full, os.path.relpath(full, site))
            os.replace(tmp, zip_path)
        spark.sparkContext.addPyFile(zip_path)
        return True
    return False
