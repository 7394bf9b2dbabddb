from .readers import read_input  # noqa: F401
