from ptx.shade import materials, textures  # noqa: F401
