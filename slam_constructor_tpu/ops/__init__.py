from . import (  # noqa: F401
    resample,
    blockmap,
    cells,
    geometry,
    grid,
    matchers,
    m3rsm,
    raycast,
    scan,
    scoring,
)
