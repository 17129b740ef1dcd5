"""Colored logger with process-role tagging.

Counterpart of /root/reference/python/minisgl/utils/logger.py:9-126 (color
logger with rank-filtered variants). On TPU the per-host controller drives all
local chips, so instead of per-rank filtering we tag log lines with a *role*
(scheduler / tokenizer / api) and optionally the PID.
"""

from __future__ import annotations

import logging
import os
import sys

from minisgl_tpu.env import ENV

_COLORS = {
    logging.DEBUG: "\x1b[37m",
    logging.INFO: "\x1b[32m",
    logging.WARNING: "\x1b[33m",
    logging.ERROR: "\x1b[31m",
    logging.CRITICAL: "\x1b[41m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def __init__(self, role: str | None):
        self.role = role
        super().__init__()

    def format(self, record: logging.LogRecord) -> str:
        color = _COLORS.get(record.levelno, "")
        pid = f"[{os.getpid()}]" if ENV.LOG_PID else ""
        role = f"[{self.role}]" if self.role else ""
        prefix = f"{color}[{record.levelname[0]}]{pid}{role}{_RESET}"
        return f"{prefix} {record.getMessage()}"


def init_logger(name: str, role: str | None = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_ColorFormatter(role))
        logger.addHandler(handler)
        logger.setLevel(ENV.LOG_LEVEL.upper())
        logger.propagate = False
    return logger
