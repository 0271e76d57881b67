from . import logistic, online_policy  # noqa: F401
