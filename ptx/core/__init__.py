from ptx.core import constants, linalg, rng  # noqa: F401
