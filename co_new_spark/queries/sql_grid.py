"""THE single source for grid-spec fragments used in DuckDB oracle SQL.

Every oracle that restates the Grid B encode (L0 digit lookup + y-first MSB
Morton refinement, /root/reference/conf.yaml:21-26, README.md:51) builds its
SQL from these two generators — one textual implementation of the bit
convention, mirroring the one numpy implementation (grid/morton.py) and the
one Column implementation (functions/cells_sql.interleave_yx_cols).
"""

from __future__ import annotations

from ..grid import grids


def l0_case(j: str = "j", i: str = "i") -> str:
    """SQL CASE for the configured ji -> base16h digit map (conf.yaml:24-26)."""
    return "CASE " + " ".join(
        f"WHEN {j} = {jj} AND {i} = {ii} THEN {d}"
        for (jj, ii), d in sorted(grids._L0_JI_TO_DIGIT.items())  # noqa: SLF001
    ) + " ELSE -1 END"


def morton_deref_y(r: int, bits: str = "rb") -> str:
    """Inverse of morton_ref, y axis: refinement bits -> iy ((r+1)//2 bits)."""
    ny = (r + 1) // 2
    terms = [f"((({bits} >> {r - 1 - t}) & 1) << {ny - 1 - t // 2})"
             for t in range(0, r, 2)]
    return "(" + " + ".join(terms) + ")" if terms else "0"


def morton_deref_x(r: int, bits: str = "rb") -> str:
    """Inverse of morton_ref, x axis: refinement bits -> ix (r//2 bits)."""
    nx = r // 2
    terms = [f"((({bits} >> {r - 1 - t}) & 1) << {nx - 1 - (t - 1) // 2})"
             for t in range(1, r, 2)]
    return "(" + " + ".join(terms) + ")" if terms else "0"


def morton_ref(r: int, iy: str = "iy", ix: str = "ix") -> str:
    """Morton interleave (y-first, MSB first) of r total bits as SQL."""
    if r == 0:
        return "0"
    ny, nx = (r + 1) // 2, r // 2
    terms = []
    for t in range(r):
        if t % 2 == 0:
            terms.append(f"((({iy} >> {ny - 1 - t // 2}) & 1) << {r - 1 - t})")
        else:
            terms.append(f"((({ix} >> {nx - 1 - t // 2}) & 1) << {r - 1 - t})")
    return "(" + " + ".join(terms) + ")"
