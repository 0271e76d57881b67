from . import candidates, montecarlo, pathsim, replay, resumable, summary  # noqa: F401
