from . import cleaning, exact, text, vectors  # noqa: F401
