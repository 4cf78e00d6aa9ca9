"""Shared loader for the native C++ helpers (graph builder, renderer).

Builds the shared library from source with g++ when missing or stale, then
verifies it with a tiny smoke call run in a SUBPROCESS before handing it to
the caller: a stale ``.so`` compiled with ``-march=native`` on a different
CPU loads fine via CDLL but dies with SIGILL on the first real call, which
cannot be caught in-process. On smoke failure the library is deleted and
rebuilt from source once; if the rebuild's smoke also fails the loader
returns None and callers fall back to their numpy paths.

The smoke verdict is cached in a ``<lib>.ok`` stamp (library mtime + a CPU
identity line), so steady-state loads don't pay the subprocess.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys


def _cpu_identity() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith(("model name", "flags"))]
        return hashlib.sha256("".join(flags[:2]).encode()).hexdigest()[:16]
    except OSError:
        return "unknown"


def _stamp_path(lib_path: str) -> str:
    return lib_path + ".ok"


def _stamp_value(lib_path: str) -> str:
    return f"{os.path.getmtime(lib_path):.6f} {_cpu_identity()}"


def _smoke(lib_path: str, smoke_code: str) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", smoke_code, lib_path],
                           capture_output=True, timeout=60)
        return r.returncode == 0
    except Exception:
        return False


def load_verified(lib_path: str, src_path: str, build, smoke_code: str):
    """Return a smoke-verified ctypes.CDLL for lib_path, or None.

    build: zero-arg callable compiling src_path -> lib_path, returns bool.
    smoke_code: python source for the subprocess check; receives the library
      path as sys.argv[1] and must exit 0 iff a real call succeeds.
    """
    # GOMP's default ACTIVE wait policy spin-waits at barriers; with OMP
    # threads == cpu count plus a busy Python main thread the box is
    # oversubscribed and a 2 ms parallel region measured 32 ms (15x) here.
    # Passive waiting costs a wakeup, which is noise at these region sizes.
    os.environ.setdefault("OMP_WAIT_POLICY", "passive")
    fresh = False
    if not os.path.exists(lib_path) or (
            os.path.exists(src_path)
            and os.path.getmtime(src_path) > os.path.getmtime(lib_path)):
        if not build():
            return None
        fresh = True

    stamp = _stamp_path(lib_path)
    verified = False
    if not fresh:
        try:
            with open(stamp) as f:
                verified = f.read().strip() == _stamp_value(lib_path)
        except OSError:
            verified = False

    if not verified:
        if not _smoke(lib_path, smoke_code):
            # Stale/foreign binary: rebuild from source once and retry.
            try:
                os.remove(lib_path)
            except OSError:
                pass
            if not (build() and _smoke(lib_path, smoke_code)):
                return None
        try:
            with open(stamp, "w") as f:
                f.write(_stamp_value(lib_path))
        except OSError:
            pass

    try:
        return ctypes.CDLL(lib_path)
    except OSError:
        return None
