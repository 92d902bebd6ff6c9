"""Driver-contract query battery (CORRECTNESS gate).

Split into ordered per-family modules; this package merges their
namespaces so ``from geotile.queries import <name>`` resolves any
query, helper or constant exactly as the former single module did.
An import-time assertion rejects a top-level name defined in two
modules (the round-3 `_cm_sql` shadowing bug class).
"""

from . import (  # noqa: E402
    b01_core,
    b02_events,
    b03_misc,
    b04_misc,
    b05_misc,
    b06_misc,
    b07_misc,
    b08_misc,
    b09_misc,
    b10_relational,
    b11_relational,
    b12_oracle_entry,
)

_PARTS = (b01_core, b02_events, b03_misc, b04_misc, b05_misc, b06_misc, b07_misc, b08_misc, b09_misc, b10_relational, b11_relational, b12_oracle_entry)

_seen: dict = {}
for _m in _PARTS:
    for _n in _m.__defined__:
        if _n in _seen:
            raise AssertionError(
                f"duplicate top-level name {_n!r} defined in both "
                f"{_seen[_n].__name__} and {_m.__name__} — rename one "
                "(shadowing corrupted the cm_user_counts oracle in r3)")
        _seen[_n] = _m
for _m in _PARTS:
    globals().update({k: v for k, v in vars(_m).items()
                      if not k.startswith("__")})
del _m, _n, _seen

