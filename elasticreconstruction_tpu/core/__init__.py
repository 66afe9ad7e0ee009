from . import camera, io_logfmt, se3, types

__all__ = ["camera", "io_logfmt", "se3", "types"]
