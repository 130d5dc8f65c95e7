from . import dist_ba, halo, mesh, multihost, particles  # noqa: F401
