"""Opportunistic ``google.protobuf`` runtime discovery.

Spark 4's ``transformWithStateInPandas`` Python workers speak a
protobuf protocol to the JVM state server (the generated gencode ships
with pyspark at ``pyspark/sql/streaming/proto/StateMessage_pb2.py``),
but the protobuf RUNTIME package is a separate install that this
container's site-packages lacks and pip cannot add.

What the container DOES ship is the public Google Cloud SDK, whose App
Engine platform bundle carries a complete pure-Python protobuf runtime
(``google/protobuf`` under ``platform/google_appengine``).  That
runtime (6.32.0-dev here) is one minor version older than pyspark's
gencode (6.33.0), which protobuf's gencode-vs-runtime validator
rejects by default; protobuf provides the documented escape hatch
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` for exactly this
skew (``google/protobuf/runtime_version.py``), and one minor version
of drift on these stable state messages is wire-compatible.

Isolation (code-review r11): the bundle also carries ancient
``google.auth`` / ``google.oauth2`` / ``google.appengine`` trees —
putting the whole bundle on ``sys.path`` would shadow any properly
installed ``google.*`` package for this process and every forked
worker.  So the shim exposes ONLY protobuf, through a private link
directory (``$TMPDIR/sfspark_pb_shim/google/protobuf`` → the bundle's
``google/protobuf``; ``google`` stays a PEP-420 namespace dir with
nothing else in it), and mutates ``os.environ`` ONLY after the import
probe through that directory succeeds — a broken bundle leaves the
process exactly as it found it.

:func:`ensure_protobuf_runtime` is called by ``session.get_spark``
BEFORE the JVM launches, because the fix must land in ``os.environ``
(not just ``sys.path``): local-mode Python workers are forked by the
JVM with the environment the JVM inherited from this process, so both
``PYTHONPATH`` and the version-check override propagate to the worker
that actually imports the gencode.  When ``google.protobuf`` is
already importable (a normally-provisioned cluster) this is a no-op
import probe and nothing is mutated.
"""

from __future__ import annotations

import os
import stat
import sys
import tempfile

#: Known public locations of a bundled pure-Python protobuf runtime.
#: Only consulted when ``import google.protobuf`` fails outright.
_CANDIDATE_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_VERSION_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

_resolved: bool | None = None
_shim_dir: str | None = None


def shim_dir_used() -> str | None:
    """The link directory the shim wired in, or None when protobuf was
    natively importable (or absent).  Callers use this to check a
    PRE-EXISTING JVM actually inherited the shim env — a SparkSession
    launched before :func:`ensure_protobuf_runtime` ran forks workers
    without it, and those workers crash at gencode import."""
    ensure_protobuf_runtime()
    return _shim_dir


def _link_dir_for(bundle: str) -> str | None:
    """Build (idempotently) the protobuf-only exposure directory for a
    bundle; returns its path or None when it cannot be constructed."""
    target = os.path.join(bundle, "google", "protobuf")
    # Per-user root + ownership check: a fixed shared-/tmp name could be
    # pre-planted by another local user, and whatever sits there would be
    # imported as google.protobuf by every forked worker (ADVICE r11).
    root = os.path.join(
        tempfile.gettempdir(), f"sfspark_pb_shim_{os.getuid()}"
    )
    link = os.path.join(root, "google", "protobuf")
    try:
        # Validate the ROOT before makedirs (ADVICE r12): the old
        # check-after-makedirs order let a pre-planted symlink at the
        # root be FOLLOWED by makedirs — creating a 'google' directory
        # at an attacker-chosen target before lstat rejected it.  Create
        # the root with mkdir(0o700); on FileExistsError verify it is a
        # real directory owned by us before touching anything inside.
        try:
            os.mkdir(root, 0o700)
        except FileExistsError:
            pass
        st = os.lstat(root)
        if not stat.S_ISDIR(st.st_mode) or st.st_uid != os.getuid():
            return None  # symlink or not ours — refuse to build/export
        os.makedirs(os.path.join(root, "google"), exist_ok=True)
        if os.path.islink(link):
            if os.readlink(link) != target:
                os.remove(link)
        if not os.path.exists(link):
            try:
                os.symlink(target, link)
            except FileExistsError:
                pass  # concurrent builder won the race — fine
        return root if os.path.isfile(
            os.path.join(link, "descriptor.py")
        ) else None
    except OSError:
        return None


def ensure_protobuf_runtime() -> bool:
    """Make ``google.protobuf`` importable in this process AND in the
    Python workers a subsequently-launched SparkSession will fork.

    Returns True when a runtime is available (native install or a
    discovered bundle), False when none exists — callers gate
    TWS-dependent features on this, exactly as they previously gated on
    a bare import probe.  Idempotent and cached."""
    global _resolved, _shim_dir
    if _resolved is not None:
        return _resolved
    try:
        from google.protobuf import descriptor  # noqa: F401

        _resolved = True
        return True
    except ImportError:
        pass
    for cand in _CANDIDATE_DIRS:
        if not os.path.isfile(
            os.path.join(cand, "google", "protobuf", "descriptor.py")
        ):
            continue
        root = _link_dir_for(cand)
        if root is None:
            continue
        inserted = root not in sys.path
        if inserted:
            sys.path.insert(0, root)
        try:
            from google.protobuf import descriptor  # noqa: F401
        except Exception:  # noqa: BLE001 — a broken bundle must not wedge startup
            if inserted:
                sys.path.remove(root)
            continue
        # mutate the environment ONLY on success: the validator reads
        # the flag at gencode import time, and forked workers see only
        # what the JVM inherited from us
        os.environ.setdefault(_VERSION_FLAG, "true")
        os.environ["PYTHONPATH"] = (
            root + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
        _resolved = True
        _shim_dir = root
        return True
    _resolved = False
    return False
