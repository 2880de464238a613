from ptx.io import bmp, hdr, image, png  # noqa: F401
