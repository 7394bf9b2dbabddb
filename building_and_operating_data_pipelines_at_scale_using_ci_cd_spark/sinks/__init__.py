from .writers import write_target, write_error_records  # noqa: F401
