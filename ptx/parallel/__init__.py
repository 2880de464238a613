from ptx.parallel import checkpoint, dist, mesh, render  # noqa: F401
