"""Structured logging for pbrlab_tpu.

The reference logs via ad-hoc std::cerr/cout and lists "use logger
(spdlog or nanolog)" as a TODO (/root/reference/README.md:202-203; e.g.
warnings at src/light-manager.cc:106, scene-load prints at
pc/pc-common.cc:114,142-147). Here: one stdlib logger with an opt-in
machine-readable JSON-lines mode for driver/CI consumption.

Env:
  PBRLAB_LOG=debug|info|warning|error   level (default warning)
  PBRLAB_LOG_JSON=1                     one JSON object per line
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time

_LOGGER_NAME = "pbrlab_tpu"


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        out = {
            "ts": round(time.time(), 3),
            "level": record.levelname.lower(),
            "name": record.name,
            "msg": record.getMessage(),
        }
        extra = getattr(record, "fields", None)
        if extra:
            out.update(extra)
        return json.dumps(out)


def get_logger(name: str = "") -> logging.Logger:
    """Module logger; configures the root pbrlab_tpu handler once."""
    root = logging.getLogger(_LOGGER_NAME)
    if not root.handlers:
        handler = logging.StreamHandler(sys.stderr)
        if os.environ.get("PBRLAB_LOG_JSON"):
            handler.setFormatter(_JsonFormatter())
        else:
            handler.setFormatter(logging.Formatter(
                "[%(levelname)s %(name)s] %(message)s"))
        root.addHandler(handler)
        level = os.environ.get("PBRLAB_LOG", "warning").upper()
        root.setLevel(getattr(logging, level, logging.WARNING))
        root.propagate = False
    return root.getChild(name) if name else root


def event(logger: logging.Logger, msg: str, **fields) -> None:
    """Log with structured fields (appear as JSON keys in JSON mode)."""
    logger.info(msg + (" " + json.dumps(fields) if fields else ""),
                extra={"fields": fields})
