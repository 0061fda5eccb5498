from . import ckks  # noqa: F401
