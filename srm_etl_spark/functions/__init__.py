from . import cleaning, geo, hashing, scoring, taxonomy, text  # noqa: F401
