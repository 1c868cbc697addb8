"""Hamiltonian-path refinement of curve orderings (host-side).

Behavior-matched to the reference DFS
(``/root/reference/src/curves/space_filling_curves.py:273-455``) -- same
neighbor priority ordering, bridge pruning, and flood-fill reachability
pruning, so given the same guide curve it finds the same path -- but
implemented with an explicit stack instead of recursion (the reference
raises the recursion limit to 10M at ``:298``; we never touch it).

This is strictly a build-time tool; at runtime the result is a static LUT.
A native C++ implementation can be plugged in later for large grids.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

Cell = Tuple[int, int]

__all__ = ["find_hamiltonian_path", "refine_curve_to_hamiltonian"]

_CARDINAL = ((1, 0), (-1, 0), (0, 1), (0, -1))
_DIAGONAL = ((1, 1), (1, -1), (-1, 1), (-1, -1))


def find_hamiltonian_path(
    width: int,
    height: int,
    adjacency_order: Optional[Dict[Cell, int]] = None,
    diag: bool = False,
) -> Optional[List[Cell]]:
    """DFS for a Hamiltonian path on a W x H grid.

    Args:
        width, height: grid dimensions.
        adjacency_order: optional cell -> priority map (lower explored
            first); when given, the search starts at its minimum.
        diag: also allow 8-way diagonal moves (deprioritized).

    Returns:
        The path as a list of cells, or ``None`` if none was found.
    """
    total = width * height
    dirs = _CARDINAL + (_DIAGONAL if diag else ())

    static_nbrs: Dict[Cell, List[Cell]] = {}
    for x in range(width):
        for y in range(height):
            static_nbrs[(x, y)] = [
                (x + dx, y + dy)
                for dx, dy in dirs
                if 0 <= x + dx < width and 0 <= y + dy < height
            ]

    visited = [[False] * height for _ in range(width)]

    def ordered_nbrs(x: int, y: int) -> List[Cell]:
        nbrs = list(static_nbrs[(x, y)])

        def key(v: Cell):
            is_diag = 1 if (abs(v[0] - x) == 1 and abs(v[1] - y) == 1) else 0
            score = adjacency_order.get(v, total) if adjacency_order else 0
            return (is_diag, score)

        nbrs.sort(key=key)
        return nbrs

    def flood_ok(sx: int, sy: int, remaining: int) -> bool:
        # Enough unvisited cells reachable from (sx, sy)?
        stack = [(sx, sy)]
        seen = {(sx, sy)}
        count = 0
        while stack:
            cx, cy = stack.pop()
            count += 1
            if count >= remaining:
                return True
            for nb in static_nbrs[(cx, cy)]:
                if not visited[nb[0]][nb[1]] and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        return count >= remaining

    def children_of(x: int, y: int, path_len: int) -> List[Cell]:
        """Unvisited neighbours with bridge pruning / forced-move detection."""
        nbrs = [nb for nb in ordered_nbrs(x, y) if not visited[nb[0]][nb[1]]]
        forced: List[Cell] = []
        filtered: List[Cell] = []
        for nb in nbrs:
            exits = sum(
                1
                for u in static_nbrs[nb]
                if not visited[u[0]][u[1]] and u != (x, y)
            )
            if exits == 0 and path_len + 1 < total:
                continue  # dead end that is not the final cell
            if exits == 1:
                forced.append(nb)
            filtered.append(nb)
        return forced or filtered

    def search(sx: int, sy: int) -> Optional[List[Cell]]:
        path: List[Cell] = [(sx, sy)]
        visited[sx][sy] = True
        if total == 1:
            return path
        # Each frame: [cell, children list, next child index].
        stack: List[list] = [[(sx, sy), children_of(sx, sy, len(path)), 0]]
        while stack:
            frame = stack[-1]
            advanced = False
            while frame[2] < len(frame[1]):
                nx, ny = frame[1][frame[2]]
                frame[2] += 1
                visited[nx][ny] = True
                path.append((nx, ny))
                if len(path) == total:
                    return path
                if flood_ok(nx, ny, total - len(path)):
                    stack.append(
                        [(nx, ny), children_of(nx, ny, len(path)), 0]
                    )
                    advanced = True
                    break
                visited[nx][ny] = False
                path.pop()
            if not advanced:
                stack.pop()
                cx, cy = frame[0]
                visited[cx][cy] = False
                if path and path[-1] == (cx, cy):
                    path.pop()
        return None

    if adjacency_order:
        starts: Sequence[Cell] = [min(adjacency_order, key=adjacency_order.get)]
    else:
        starts = [(0, 0), (width - 1, 0), (0, height - 1), (width - 1, height - 1)]

    for sx, sy in starts:
        result = search(sx, sy)
        if result is not None:
            return result
        # search() fully restores ``visited`` on failure.
    return None


def refine_curve_to_hamiltonian(
    curve: Sequence[Cell], width: int, height: int
) -> Optional[List[Cell]]:
    """Turn an approximate curve into a true Hamiltonian path.

    Uses the curve order as the DFS priority, mirroring the reference
    ``refine_curve_to_hamiltonian`` (``space_filling_curves.py:446-455``).
    """
    priority = {tuple(pt): idx for idx, pt in enumerate(curve)}
    return find_hamiltonian_path(width, height, adjacency_order=priority)
