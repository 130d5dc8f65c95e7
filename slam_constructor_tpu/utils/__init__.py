from . import (  # noqa: F401
    checkpoint,
    config,
    datagen,
    dataset,
    evaluate,
    metrics,
    profiling,
    trajectory,
    viz,
)
