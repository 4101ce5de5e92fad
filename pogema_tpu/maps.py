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


def load_movingai(text: str):
    """Parse a MovingAI ``.map`` file (the benchmark-map format used by
    the pogema ecosystem's city/warehouse collections): header lines
    (type/height/width/map), then rows where ``.``/``G``/``S`` are free
    and ``@``/``O``/``T``/``W`` are obstacles. Returns list[list[int]]
    suitable for ``GridConfig(map=...)`` or :func:`register_map`."""
    lines = [ln.rstrip("\n") for ln in text.splitlines()]
    try:
        start = next(i for i, ln in enumerate(lines) if ln.strip() == "map") + 1
    except StopIteration as e:
        raise ValueError("not a MovingAI .map file (no 'map' header)") from e
    free = {".", "G", "S"}
    grid = []
    for ln in lines[start:]:
        if not ln.strip():
            continue
        grid.append([0 if ch in free else 1 for ch in ln.strip()])
    if not grid:
        raise ValueError("empty MovingAI map body")
    width = max(len(r) for r in grid)
    for r in grid:
        r.extend([1] * (width - len(r)))
    return grid


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
