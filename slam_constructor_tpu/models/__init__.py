from . import engine, tiny, viny  # noqa: F401
