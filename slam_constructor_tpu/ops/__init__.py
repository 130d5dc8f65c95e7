from . import (  # noqa: F401
    cells,
    geometry,
    grid,
    matchers,
    raycast,
    scan,
    scoring,
)
