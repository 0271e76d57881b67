from . import analyzer, audit, chart, checkpoint, db, feed, portfolio, qvoice, trainstore  # noqa: F401
