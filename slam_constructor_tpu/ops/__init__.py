from . import (  # noqa: F401
    resample,
    cells,
    geometry,
    grid,
    matchers,
    m3rsm,
    raycast,
    scan,
    scoring,
)
