from ptx.runtime.api import (  # noqa: F401
    RenderFarmClient,
    RenderFarmServer,
    WorkPool,
    load_library,
    rgbe_decode,
    rgbe_encode,
    runtime_available,
)
