from ptx.integrate import camera, render, trace  # noqa: F401
