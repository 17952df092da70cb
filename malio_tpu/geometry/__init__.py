from . import so3, se3, s2  # noqa: F401
