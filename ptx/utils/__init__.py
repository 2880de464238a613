from ptx.utils import profiling  # noqa: F401
