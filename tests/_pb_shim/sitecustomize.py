"""Worker-side hook that makes a vendored protobuf runtime importable.

The ``transformWithStateInPandas`` (arbitrary-state v2) Python worker
imports ``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs
the ``google.protobuf`` runtime. This container has no pip-installed
protobuf, but the google-cloud-sdk ships a pure-Python runtime (6.32).
Rather than committing a machine-specific symlink, this hook probes a
small list of known install locations at runtime (override with the
``PB_SHIM_GOOGLE_ROOT`` env var — the directory CONTAINING ``google/``)
and appends the first root whose ``google/protobuf`` exists to
``sys.path``. Test plumbing only — production clusters install
protobuf normally and this hook then does nothing.

Activated by tests/conftest.py putting this directory on PYTHONPATH
before the SparkSession (hence the JVM, hence its Python workers)
starts; Python imports ``sitecustomize`` automatically at startup.

The gencode shipped with pyspark is 6.33; the vendored runtime is
6.32. Those minors are wire-compatible for StateMessage.proto (plain
proto3, no 6.33-only features), so the strict "runtime >= gencode"
guard is relaxed to same-major — a real incompatibility would still
fail loudly at parse time, not silently corrupt.
"""

import importlib.util
import os
import sys

# Roots whose google/protobuf may hold a pure-Python runtime, probed in
# order. Each entry is the directory CONTAINING the google/ package.
_CANDIDATE_ROOTS = [
    os.environ.get("PB_SHIM_GOOGLE_ROOT", ""),
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/lib64/google-cloud-sdk/platform/google_appengine",
    "/opt/google-cloud-sdk/platform/google_appengine",
    os.path.expanduser("~/google-cloud-sdk/platform/google_appengine"),
    # legacy layout: a vendor/google symlink next to this file
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "vendor"),
]


def _importable(name: str) -> bool:
    """True only for a REGULAR package/module, not a bare namespace
    portion — spark-core.jar sits on the Python worker's sys.path and
    its internal google/ directory forms an empty namespace
    google.protobuf that would otherwise masquerade as a runtime."""
    try:
        spec = importlib.util.find_spec(name)
    except ModuleNotFoundError:  # parent package absent entirely
        return False
    return spec is not None and spec.origin is not None


def _find_runtime_root() -> str | None:
    for root in _CANDIDATE_ROOTS:
        if root and os.path.isdir(os.path.join(root, "google", "protobuf")):
            return root
    return None


def _enable() -> bool:
    """Idempotent; returns True iff google.protobuf is importable."""
    if _importable("google.protobuf"):
        return True  # a real install exists — never shadow it
    root = _find_runtime_root()
    if root is None:
        return False
    if root not in sys.path:
        # append, not prepend: a later real install still wins lookups
        sys.path.append(root)
    if not _importable("google.protobuf"):
        return False
    try:
        from google.protobuf import runtime_version as _rv

        _orig = _rv.ValidateProtobufRuntimeVersion

        def _lenient(domain, major, minor, patch, suffix, location):
            try:
                _orig(domain, major, minor, patch, suffix, location)
            except _rv.VersionError:
                if major != _rv.MAJOR:  # cross-major: genuinely unsafe
                    raise

        _rv.ValidateProtobufRuntimeVersion = _lenient
    except ImportError:
        pass  # ancient runtime without the guard — nothing to relax
    return True


_enable()
