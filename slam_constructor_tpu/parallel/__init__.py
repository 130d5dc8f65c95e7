from . import dist_ba, halo, mesh, particles  # noqa: F401
