from . import exits, gates, lifecycle, planner, state  # noqa: F401
