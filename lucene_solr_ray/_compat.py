"""Environment workarounds.

`ray.data`'s path resolution imports `fsspec.implementations.http` on every
read/write; in this environment that import fails (no `aiohttp`).  Python
removes the failed module from sys.modules, so two threads writing
concurrently can race: one sees the other's partially-initialized module and
gets `ImportError: cannot import name 'HTTPFileSystem'`, which Ray's
`except ModuleNotFoundError` does not catch.  Pre-seeding a complete stub
module makes the import always succeed (the sentinel class never matches a
real filesystem instance, so behavior is unchanged)."""

from __future__ import annotations

import sys
import types


def install_fsspec_http_stub() -> None:
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # real module works
    except ImportError:
        pass
    if "fsspec.implementations.http" in sys.modules:
        return
    shim = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel only — never instantiated
        pass

    shim.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = shim


install_fsspec_http_stub()
