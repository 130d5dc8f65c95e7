from . import (  # noqa: F401
    resample,
    blockmap,
    cells,
    cow,
    geometry,
    grid,
    matchers,
    m3rsm,
    pallas_kernels,
    raycast,
    scan,
    scoring,
)
