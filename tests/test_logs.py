"""Log source: file handler setup, Spark read-back parse, text tail."""

import logging
import os

from sports_data_integration_and_forecasting_pipeline_spark.sources.logs import (
    configure_file_logging,
    read_log_entries,
    render_log_text,
)


def _write_sample_log(tmp_path):
    log_path = os.path.join(tmp_path, "logs", "app.log")
    logger = configure_file_logging(log_path, logger_name="sparkline_test")
    logger.info("fetch ok sport=%s rows=%d", "nba", 42)
    logger.warning("stale cache used")
    with open(log_path, "a") as f:
        f.write("Traceback (most recent call last):\n")  # unparseable line
    logger.error("fetch failed")
    for h in list(logger.handlers):
        h.close()
        logger.removeHandler(h)
    return log_path


def test_configure_is_idempotent(tmp_path):
    p = os.path.join(tmp_path, "app.log")
    lg1 = configure_file_logging(p, logger_name="sparkline_idem")
    lg2 = configure_file_logging(p, logger_name="sparkline_idem")
    assert lg1 is lg2
    assert (
        sum(isinstance(h, logging.FileHandler) for h in lg1.handlers) == 1
    )
    for h in list(lg1.handlers):
        h.close()
        lg1.removeHandler(h)


def test_read_log_entries_parses_levels(spark, tmp_path):
    log_path = _write_sample_log(str(tmp_path))
    df = read_log_entries(spark, log_path)
    rows = df.orderBy("raw").collect()
    assert len(rows) == 4
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert len(by_level["INFO"]) == 1
    assert by_level["INFO"][0]["message"] == "fetch ok sport=nba rows=42"
    assert by_level["INFO"][0]["log_ts"] is not None
    assert len(by_level["WARNING"]) == 1 and len(by_level["ERROR"]) == 1
    # the traceback line survives unparsed: null ts/level, full text kept
    unparsed = by_level[None]
    assert len(unparsed) == 1
    assert unparsed[0]["message"].startswith("Traceback")
    assert unparsed[0]["log_ts"] is None


def test_read_log_entries_stays_jvm_side(spark, tmp_path):
    log_path = _write_sample_log(str(tmp_path))
    plan = (
        read_log_entries(spark, log_path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_render_log_text_tail(tmp_path):
    log_path = _write_sample_log(str(tmp_path))
    full = render_log_text(log_path, max_chars=0)
    assert "stale cache used" in full
    tail = render_log_text(log_path, max_chars=20)
    assert len(tail) == 20 and full.endswith(tail)
    assert render_log_text(os.path.join(str(tmp_path), "missing.log")) == ""
