from ptx.scenes import builders, spec  # noqa: F401
