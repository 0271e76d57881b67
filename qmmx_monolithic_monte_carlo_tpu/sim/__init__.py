from . import candidates, montecarlo, replay, summary  # noqa: F401
