from . import engine, full, gmapping, posegraph, tiny, viny  # noqa: F401
