from . import candidates, montecarlo, pathsim, replay, summary  # noqa: F401
