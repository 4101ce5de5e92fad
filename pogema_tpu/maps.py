"""Named map registry (upstream: ``GridConfig.map_name`` + the ecosystem
map collections, SURVEY.md §1 "Ecosystem"). Core ships a few built-in
layouts; users register their own with :func:`register_map` (string maps
use the same ``.#``/letter grammar as ``GridConfig.map``).
"""

from __future__ import annotations

_REGISTRY: dict = {}


def register_map(name: str, map_spec) -> None:
    if name in _REGISTRY:
        raise ValueError(f"map {name!r} already registered")
    _REGISTRY[name] = map_spec


def get_map(name: str):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown map {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def list_maps() -> list:
    return sorted(_REGISTRY)


# -- built-ins ----------------------------------------------------------

register_map(
    "empty-8x8",
    "\n".join(["." * 8] * 8),
)

register_map(
    "bottleneck-8x8",
    """
    ....#...
    ....#...
    ....#...
    ........
    ....#...
    ....#...
    ....#...
    ....#...
    """,
)

register_map(
    "cross-9x9",
    """
    ####.####
    ####.####
    ####.####
    ####.####
    .........
    ####.####
    ####.####
    ####.####
    ####.####
    """,
)

register_map(
    "warehouse-16x16",
    """
    ................
    .##.##.##.##.##.
    .##.##.##.##.##.
    ................
    .##.##.##.##.##.
    .##.##.##.##.##.
    ................
    .##.##.##.##.##.
    .##.##.##.##.##.
    ................
    .##.##.##.##.##.
    .##.##.##.##.##.
    ................
    .##.##.##.##.##.
    .##.##.##.##.##.
    ................
    """,
)

register_map(
    "rooms-16x16",
    """
    ................
    ................
    ................
    ................
    ................
    #####.#####.####
    ................
    ................
    ................
    ................
    #####.#####.####
    ................
    ................
    ................
    ................
    ................
    """,
)
