"""Dialect/format registry — parity with the reference's global dialect map
(database/dialect.go:9-61, database/source.go:31-41): name -> source factory,
duplicate registration is an error, unknown dialect is an error.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


class DialectError(KeyError):
    pass


def register_dialect(name: str, factory: Callable, *, replace: bool = False) -> None:
    """Register a source factory. Duplicate registration raises, matching
    RegisterDialect's panic-on-dup (dialect.go:24-31)."""
    if name in _REGISTRY and not replace:
        raise DialectError(f"dialect {name!r} already registered")
    _REGISTRY[name] = factory


def get_dialect(name: str) -> Callable:
    if name not in _REGISTRY:
        raise DialectError(
            f"dialect {name!r} not registered; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def dialects() -> list[str]:
    return sorted(_REGISTRY)
