"""Occupancy-grid obstacle maps for the 2-D particle environments.

The grid is built once on the host (numpy) and becomes a static jnp array;
the hot-path collision lookup is a clamped gather, fully jittable/vmappable
(counterpart of reference ``src/utils/obstacle_map.py:13-97`` and
``src/utils/obstacle.py:30-69``).
"""
from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ObstacleMap(NamedTuple):
    """Static occupancy grid. ``grid[ix, iy] ∈ {0, 1}``; world origin at center."""

    grid: jax.Array  # [nx, ny] float32
    cell_size: float
    offset: Tuple[int, int]  # origin cell indices (center of the map)

    @property
    def xlim(self) -> Tuple[float, float]:
        half = self.cell_size * self.grid.shape[0] / 2.0
        return (-half, half)

    @property
    def ylim(self) -> Tuple[float, float]:
        half = self.cell_size * self.grid.shape[1] / 2.0
        return (-half, half)


def get_collisions(omap: ObstacleMap, xy: jax.Array) -> jax.Array:
    """Occupancy value at world positions ``xy [..., 2]`` → ``[...]``.

    Out-of-bounds queries clamp to the border cells (which the generator fills
    with walls), matching reference ``obstacle_map.py:68-97``.
    """
    grid = omap.grid
    idx = jnp.floor(xy / omap.cell_size + jnp.asarray(omap.offset, xy.dtype)).astype(jnp.int32)
    ix = jnp.clip(idx[..., 0], 0, grid.shape[0] - 1)
    iy = jnp.clip(idx[..., 1], 0, grid.shape[1] - 1)
    return grid[ix, iy]


def to_map_coord(omap: ObstacleMap, xy: jax.Array) -> jax.Array:
    """World position → fractional cell coordinates (for plotting)."""
    return jnp.asarray(omap.offset, xy.dtype) + xy / omap.cell_size


# ---------------------------------------------------------------------------
# Host-side map construction.
# ---------------------------------------------------------------------------


def _add_rect(grid: np.ndarray, cell_size: float, offset, cx, cy, w, h) -> None:
    """Rasterize an axis-aligned rectangle (center, width, height) in-place.

    Reference-exact (``src/utils/obstacle.py:14-15,56-69``, verified cell-for-
    cell in ``test_reference_parity.py``), including its quirks: centers are
    ``int()``-truncated, cell extents are ``ceil``-rounded, and the raw python
    slice is used — so a rectangle whose start index is negative rasterizes
    nothing (which is why the reference's left/bottom border walls are absent
    from its maps).
    """
    cx, cy = int(cx), int(cy)
    wc = math.ceil(w / cell_size)
    hc = math.ceil(h / cell_size)
    cxc = math.ceil(cx / cell_size)
    cyc = math.ceil(cy / cell_size)
    x0 = cxc - math.ceil(wc / 2.0) + offset[0]
    x1 = cxc + math.ceil(wc / 2.0) + offset[0]
    y0 = cyc - math.ceil(hc / 2.0) + offset[1]
    y1 = cyc + math.ceil(hc / 2.0) + offset[1]
    grid[x0:x1, y0:y1] = 1.0


def obstacle_preset(name: str, width: float = 2.0) -> List[Tuple[float, float, float, float]]:
    """Named obstacle layouts ``[(cx, cy, w, h), ...]``.

    Regenerates the reference's presets (``obstacle_map.py:105-243``) from
    their generating patterns: regular ``k×k`` grids with spacing ``s`` and
    staggered rows.
    """
    w = width

    def grid_layout(k: int, s: float):
        coords = [s * (i - (k - 1) / 2.0) for i in range(k)]
        return [(x, y, w, w) for y in reversed(coords) for x in coords]

    def staggered(rows: Sequence[Tuple[int, float, float]], s: float):
        out = []
        for count, y, x_off in rows:
            xs = [s * (i - (count - 1) / 2.0) + x_off for i in range(count)]
            out.extend((x, y, w, w) for x in xs)
        return out

    if name == "grid_3x3":
        return grid_layout(3, 5.0)
    if name == "grid_4x4":
        return grid_layout(4, 4.0)
    if name == "sm_grid_4x4":
        return grid_layout(4, 1.0)
    if name == "grid_6x6":
        return grid_layout(6, 3.0)
    if name == "staggered_3-2-3":
        return staggered([(3, 4.0, 0.0), (4, 0.0, 0.0), (3, -4.0, 0.0)], 4.0)
    if name == "staggered_4-3-4-3-4":
        return staggered(
            [(4, 6.0, 0.0), (3, 3.0, 0.0), (4, 0.0, 0.0), (3, -3.0, 0.0), (4, -6.0, 0.0)],
            4.0,
        )
    if name == "single_centred":
        return [(0.0, 0.0, w, w)]
    raise ValueError(f"Unknown obstacle preset: {name}")


def generate_obstacle_map(
    map_size: Tuple[int, int],
    obstacles: Sequence[Tuple[float, float, float, float]],
    cell_size: float,
    *,
    with_borders: bool = True,
    rng: Optional[np.random.Generator] = None,
    num_random: int = 0,
    random_xy_limits=None,
    random_shape: Tuple[float, float] = (2.0, 2.0),
) -> ObstacleMap:
    """Build an :class:`ObstacleMap` from fixed rectangles (+ optional random ones).

    ``map_size`` is the world extent (must be even, origin-centered); border
    walls of width ``4*cell_size`` are added on every side like the reference
    generator (``obstacle_map.py:327-337``).
    """
    assert map_size[0] % 2 == 0 and map_size[1] % 2 == 0, "map size must be even"
    nx = math.ceil(map_size[0] / cell_size)
    ny = math.ceil(map_size[1] / cell_size)
    offset = (nx // 2, ny // 2)
    grid = np.zeros((nx, ny), dtype=np.float32)

    for cx, cy, w, h in obstacles:
        _add_rect(grid, cell_size, offset, cx, cy, w, h)

    if with_borders:
        half_x = cell_size * nx / 2.0
        half_y = cell_size * ny / 2.0
        for xl in (-half_x, half_x):
            _add_rect(grid, cell_size, offset, xl, 0.0, 4 * cell_size, 2 * half_y)
        for yl in (-half_y, half_y):
            _add_rect(grid, cell_size, offset, 0.0, yl, 2 * half_x, 4 * cell_size)

    if num_random > 0:
        rng = rng or np.random.default_rng()
        xlim, ylim = random_xy_limits or ((-map_size[0] / 2, map_size[0] / 2),) * 2
        placed = 0
        attempts = 0
        while placed < num_random and attempts < 25 * num_random:
            cx = rng.uniform(*xlim)
            cy = rng.uniform(*ylim)
            # rasterize the candidate alone so overlap against the existing
            # grid is detectable (adding in place always writes 1s and can
            # never disagree with occupied cells)
            candidate = np.zeros_like(grid)
            _add_rect(candidate, cell_size, offset, cx, cy, *random_shape)
            attempts += 1
            if not np.any((candidate > 0) & (grid > 0)):
                grid = np.maximum(grid, candidate)
                placed += 1

    return ObstacleMap(jnp.asarray(grid), float(cell_size), offset)
