"""Logging helpers (reference: timm.utils.setup_default_logging used at
/root/reference/train_mirror.py:644)."""

import logging
import logging.handlers
import os


class _FormatterNoInfo(logging.Formatter):
    """Omit the level prefix for INFO lines so normal progress output stays clean."""

    def __init__(self, fmt: str = "%(levelname)s: %(message)s") -> None:
        super().__init__(fmt)

    def format(self, record: logging.LogRecord) -> str:
        if record.levelno == logging.INFO:
            return str(record.getMessage())
        return super().format(record)


def setup_default_logging(default_level: int = logging.INFO, log_path: str = "") -> None:
    console_handler = logging.StreamHandler()
    console_handler.setFormatter(_FormatterNoInfo())
    root = logging.getLogger()
    # idempotent: avoid duplicate handlers when called repeatedly (tests,
    # in-process resume). FileHandler subclasses StreamHandler, so the
    # console check must EXCLUDE file handlers or an existing file handler
    # would suppress the console one.
    if not any(
        isinstance(h, logging.StreamHandler)
        and not isinstance(h, logging.FileHandler)
        for h in root.handlers
    ):
        root.addHandler(console_handler)
    root.setLevel(default_level)
    if log_path:
        already = any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == os.path.abspath(log_path)
            for h in root.handlers
        )
        if not already:
            file_handler = logging.handlers.RotatingFileHandler(
                log_path, maxBytes=(1024**2 * 2), backupCount=3
            )
            file_formatter = logging.Formatter(
                "%(asctime)s - %(name)20s: [%(levelname)8s] - %(message)s"
            )
            file_handler.setFormatter(file_formatter)
            root.addHandler(file_handler)
