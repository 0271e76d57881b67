from . import app  # noqa: F401

# NOTE: host.cli is intentionally not imported here so `python -m ...host.cli`
# doesn't trip runpy's double-import warning.
