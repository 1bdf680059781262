"""User-configurable logging, mirroring the reference's ``logger.conf``.

The reference loads a user-editable ``logging.config.fileConfig`` in every
module (reference train.py:43-44, logger.conf). Here every CLI entry point
calls :func:`setup_logging` once: if a ``logger.conf`` exists (repo root, or
the path in ``$SMT_LOGGER_CONF``), it is loaded verbatim — users tune levels,
handlers and formats without touching code — otherwise a ``basicConfig``
with the same default format applies.
"""

from __future__ import annotations

import logging
import logging.config
import os

DEFAULT_FORMAT = "%(asctime)s %(name)s %(levelname)s: %(message)s"


def setup_logging() -> None:
    conf = os.environ.get("SMT_LOGGER_CONF") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "logger.conf")
    if os.path.isfile(conf):
        # keep module-level loggers created before this call alive
        logging.config.fileConfig(conf, disable_existing_loggers=False)
    else:
        logging.basicConfig(level=logging.INFO, format=DEFAULT_FORMAT)
