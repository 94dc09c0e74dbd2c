"""Logging helpers.

Parity: ``TqdmHandler`` (``/root/reference/torecsys/utils/logging.py:13-28``)
— a logging handler that interleaves log records with active tqdm progress
bars via ``tqdm.write`` so bars are not corrupted by log lines.  The trainer
itself logs through plain ``logging`` (progress on a TPU pod is step-count
logs, not terminal bars), but host-side tooling — downloads
(``data/sample_data.py``), file streaming — pairs naturally with tqdm bars,
and this handler keeps both readable.
"""

from __future__ import annotations

import logging
import sys


class TqdmHandler(logging.Handler):
    """Route log records through ``tqdm.write`` (falls back to stderr).

    Drop-in for a ``StreamHandler``::

        handler = TqdmHandler()
        handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logging.getLogger().addHandler(handler)
    """

    def emit(self, record: logging.LogRecord) -> None:
        try:
            msg = self.format(record)
            try:
                from tqdm import tqdm

                tqdm.write(msg, file=sys.stderr)
            except ImportError:  # pragma: no cover
                sys.stderr.write(msg + "\n")
            self.flush()
        except Exception:  # noqa: BLE001 — logging must never raise
            self.handleError(record)


__all__ = ["TqdmHandler"]
