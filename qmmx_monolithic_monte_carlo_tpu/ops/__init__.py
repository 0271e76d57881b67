from . import confidence, features, guard, hitscan, pathgen, touch  # noqa: F401
