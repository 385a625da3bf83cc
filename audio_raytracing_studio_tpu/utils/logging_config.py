"""Structured logging (SURVEY §5.5) — replaces the reference's ~80 print()s.

One logger hierarchy rooted at "ars_tpu" with level control via the
ARS_TPU_LOG_LEVEL environment variable.
"""

from __future__ import annotations

import logging
import os

ROOT_LOGGER = "ars_tpu"


def configure(level: str | int | None = None) -> logging.Logger:
    """Configure the framework logger once; idempotent."""
    logger = logging.getLogger(ROOT_LOGGER)
    if logger.handlers:
        return logger
    if level is None:
        level = os.environ.get("ARS_TPU_LOG_LEVEL", "INFO")
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    logger.addHandler(handler)
    logger.setLevel(level)
    return logger


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"{ROOT_LOGGER}.{name}")
