"""Optional-dependency shims.

ensure_protobuf(): make ``google.protobuf`` importable. If the real runtime
is installed, do nothing (it always wins). Otherwise add the vendored
minimal runtime (``_vendor/google/protobuf`` — an original implementation of
the public wire-format subset pyspark's transformWithStateInPandas protocol
uses; see ``_vendor/google/protobuf/internal/_runtime.py``) to sys.path AND
to PYTHONPATH, so Python workers forked by the JVM resolve it too. Call
BEFORE creating the SparkSession whose workers need it — the executor
environment snapshots PYTHONPATH at JVM launch.
"""

from __future__ import annotations

import os
import sys

_VENDOR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")


def ensure_protobuf() -> str:
    """Returns 'real' if the installed protobuf is used, 'vendored' if the
    mini runtime was activated."""
    try:
        import google.protobuf  # noqa: F401

        return "real"
    except ImportError:
        pass
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    existing = os.environ.get("PYTHONPATH", "")
    if _VENDOR not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _VENDOR + os.pathsep + existing if existing else _VENDOR
        )
    import google.protobuf  # noqa: F401

    return "vendored"
