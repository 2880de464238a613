from ptx.geom import primitives, spans, tape  # noqa: F401
