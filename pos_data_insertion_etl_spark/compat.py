"""Optional-dependency activation.

The engine itself never needs protobuf -- only PySpark's stateful
processing v2 runtime (``transformWithStateInPandas``) does, via its
driver<->worker StateMessage protocol. ``ensure_protobuf()`` makes that
runtime usable on images that ship no protobuf distribution by
activating the vendored redirect shim (see ``_vendor/pbshim``) when --
and only when -- no real ``google.protobuf`` is importable.

Call it BEFORE creating the SparkSession whose workers must see the
shim: it exports PYTHONPATH so worker subprocesses (forked by the JVM /
Python daemon, which inherit the driver environment captured at JVM
launch) resolve the same modules.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_PBSHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor", "pbshim")
_CLOUDSDK_PB = "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf"


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, returning whether it is.

    Order of preference: a real installation (untouched), then the
    vendored cloudsdk redirect. Returns False when neither exists, so
    callers/tests can skip with an honest reason.
    """
    if _find_spec_quiet("google.protobuf") is not None:
        return True
    if not os.path.isdir(_CLOUDSDK_PB):
        return False
    if _PBSHIM_DIR not in sys.path:
        sys.path.insert(0, _PBSHIM_DIR)
    # Workers inherit the env the JVM was launched with; export for
    # sessions created after this call.
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    if _PBSHIM_DIR not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([_PBSHIM_DIR, *parts])
    # The cloudsdk copy is pure Python; never let protobuf probe for a
    # C/upb extension that is not there.
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    return _find_spec_quiet("google.protobuf") is not None


def _find_spec_quiet(name: str):
    """find_spec that treats a missing parent package as 'not found'
    (importlib raises ModuleNotFoundError for the parent otherwise)."""
    try:
        return importlib.util.find_spec(name)
    except ModuleNotFoundError:
        return None
