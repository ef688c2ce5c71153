from .hybrid import hybrid_search  # noqa: F401
