from . import (  # noqa: F401
    resample,
    cells,
    geometry,
    grid,
    matchers,
    raycast,
    scan,
    scoring,
)
