from . import prng, profiling  # noqa: F401
