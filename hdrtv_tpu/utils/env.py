"""Environment-variable config parsing.

The reference exposes ~90 ad-hoc ``HDRTVNET_*`` environment variables parsed
with little helpers scattered per-module (see /root/reference/README.md:271-317
and the ``_env_bool/_env_float/_env_int`` pattern in nearly every src module).
Here the helpers are centralized; modules keep the same env names so a user of
the reference can carry their environment over unchanged.
"""

from __future__ import annotations

import os

_TRUTHY = {"1", "true", "yes", "on", "y", "t"}
_FALSY = {"0", "false", "no", "off", "n", "f", ""}


def env_str(name: str, default: str = "") -> str:
    value = os.environ.get(name)
    return default if value is None else str(value)


def env_bool(name: str, default: bool = False) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    token = raw.strip().lower()
    if token in _TRUTHY:
        return True
    if token in _FALSY:
        return False
    return default


def env_int(name: str, default: int = 0, *, lo: int | None = None, hi: int | None = None) -> int:
    try:
        value = int(str(os.environ.get(name, default)).strip())
    except (TypeError, ValueError):
        value = default
    if lo is not None:
        value = max(lo, value)
    if hi is not None:
        value = min(hi, value)
    return value


def env_float(
    name: str, default: float = 0.0, *, lo: float | None = None, hi: float | None = None
) -> float:
    try:
        value = float(str(os.environ.get(name, default)).strip())
    except (TypeError, ValueError):
        value = default
    if value != value:  # NaN guard
        value = default
    if lo is not None:
        value = max(lo, value)
    if hi is not None:
        value = min(hi, value)
    return value
