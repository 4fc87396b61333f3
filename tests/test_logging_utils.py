"""setup_default_logging idempotence: repeated calls (tests, in-process
resume) must not stack handlers, and a pre-existing file handler must not
suppress the console handler (FileHandler subclasses StreamHandler)."""

import logging

from mirror_tpu.utils.logging import setup_default_logging


def _fresh_root():
    root = logging.getLogger()
    saved = root.handlers[:]
    root.handlers[:] = []
    return root, saved


def test_repeated_setup_single_file_handler(tmp_path):
    root, saved = _fresh_root()
    try:
        log = str(tmp_path / "train.log")
        setup_default_logging(log_path=log)
        setup_default_logging(log_path=log)
        files = [h for h in root.handlers
                 if isinstance(h, logging.FileHandler)]
        consoles = [h for h in root.handlers
                    if isinstance(h, logging.StreamHandler)
                    and not isinstance(h, logging.FileHandler)]
        assert len(files) == 1
        assert len(consoles) == 1
    finally:
        root.handlers[:] = saved


def test_existing_file_handler_does_not_suppress_console(tmp_path):
    root, saved = _fresh_root()
    try:
        root.addHandler(logging.FileHandler(str(tmp_path / "other.log")))
        setup_default_logging()
        consoles = [h for h in root.handlers
                    if isinstance(h, logging.StreamHandler)
                    and not isinstance(h, logging.FileHandler)]
        assert len(consoles) == 1
    finally:
        for h in root.handlers:
            if isinstance(h, logging.FileHandler):
                h.close()
        root.handlers[:] = saved
