from . import mesh, sweep, universe  # noqa: F401
