"""Framework-wide numeric constants.

Mirrors the reference's tolerance/sentinel scheme (see
``/root/reference/include/misc.h:7-8``): ``EPS`` is the geometric tolerance
used for self-intersection offsets and degenerate-ray tests; ``MAX_VALUE``
is the finite "infinity" sentinel used for half-infinite plane spans.  A ray
whose nearest boundary is at ``t >= MAX_VALUE`` has escaped the scene
(``/root/reference/include/path-trace.h:68-71``).
"""

EPS = 1e-3
MAX_VALUE = 1e20

# Default integrator settings (reference: path-trace.h:57,167-170).
DEFAULT_RAY_DEPTH = 16
DEFAULT_SAMPLE_COUNT = 200
DEFAULT_SCREEN_WIDTH = 4.0 / 3.0
DEFAULT_SCREEN_HEIGHT = 1.0
DEFAULT_SCREEN_DISTANCE = 2.0
