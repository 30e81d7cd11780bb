"""Application-log source: file logging setup plus a Spark read-back view.

The reference ships a notebook widget that reads its log file back as raw
text (``Sports-Pipeline-V2/widgets_ui.py:64-70``) after configuring file
logging with ``"%(asctime)s [%(levelname)s] %(message)s"``
(``Sports-Pipeline-V2/odds_utils.py:22-29``). The engine's equivalents:

- :func:`configure_file_logging` — the same opt-in file handler/format.
- :func:`read_log_entries` — the log as a DataFrame (``spark.read.text``
  plus a JVM-side regexp projection), so log analytics compose with every
  other operator (filter by level, window by time, join to runs). At
  scale this reads a whole directory of executor/app logs in one scan.
- :func:`render_log_text` — the literal widget behavior (driver-side tail
  of the raw text) for parity with the notebook surface.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the reference's logging format (odds_utils.py:25-28)
LOG_FORMAT = "%(asctime)s [%(levelname)s] %(message)s"

# "2024-01-02 03:04:05,678 [INFO] message ..." — asctime's default
# rendering, a bracketed level, then everything else.
_LINE_RE = r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) \[([A-Z]+)\] (.*)$"


def configure_file_logging(
    log_path: str = os.path.join("logs", "app.log"),
    level: int = logging.INFO,
    logger_name: str | None = None,
) -> logging.Logger:
    """Attach a file handler in the reference's format to ``logger_name``
    (default: the package root logger). Returns the logger. Idempotent per
    (logger, path): an existing handler for the same file is reused."""
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    name = logger_name or __name__.rsplit(".", 2)[0]
    logger = logging.getLogger(name)
    logger.setLevel(level)
    target = os.path.abspath(log_path)
    for h in logger.handlers:
        if isinstance(h, logging.FileHandler) and h.baseFilename == target:
            return logger
    handler = logging.FileHandler(log_path)
    handler.setFormatter(logging.Formatter(LOG_FORMAT))
    logger.addHandler(handler)
    return logger


def read_log_entries(spark: SparkSession, path: str) -> DataFrame:
    """The log file (or directory of log files) as a DataFrame:
    ``(log_ts timestamp, level string, message string, raw string)``.

    Lines that don't match the format (tracebacks, partial writes) keep
    null ``log_ts``/``level`` and their full text in ``message`` so
    nothing is silently dropped. The parse is a narrow JVM regexp
    projection over ``spark.read.text`` — no Python in the row path."""
    lines = spark.read.text(path)
    ts_s = F.regexp_extract("value", _LINE_RE, 1)
    level = F.regexp_extract("value", _LINE_RE, 2)
    msg = F.regexp_extract("value", _LINE_RE, 3)
    matched = ts_s != ""
    return lines.select(
        F.when(
            matched,
            F.to_timestamp(ts_s, "yyyy-MM-dd HH:mm:ss,SSS"),
        ).alias("log_ts"),
        F.when(matched, level).alias("level"),
        F.when(matched, msg).otherwise(F.col("value")).alias("message"),
        F.col("value").alias("raw"),
    )


def render_log_text(
    log_path: str = os.path.join("logs", "app.log"), max_chars: int = 20_000
) -> str:
    """The notebook-widget behavior (widgets_ui.py:64-70): the latest log
    content as text, tail-truncated to ``max_chars``. Missing file => ''."""
    if not os.path.exists(log_path):
        return ""
    with open(log_path, "r") as f:
        content = f.read()
    return content[-max_chars:] if max_chars else content
