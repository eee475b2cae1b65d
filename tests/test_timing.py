"""Verbosity/timing logging parity (reference: tests/test_backend.py
test_logging / test_logging_parametrized — query text at verbosity 1,
execution timings at verbosity 2, silence at 0)."""

import logging

import pytest

from xdump_spark.timing import configure, log_time, logger


@pytest.mark.parametrize(
    "verbosity,level",
    [(0, logging.WARNING), (1, logging.INFO), (2, logging.DEBUG), (5, logging.DEBUG)],
)
def test_configure_maps_verbosity(verbosity, level):
    configure(verbosity)
    assert logger.level == level


def test_log_time_emits_label_and_seconds(caplog):
    configure(1)
    with caplog.at_level(logging.INFO, logger="xdump_spark"):
        with log_time("dump employees"):
            pass
    [rec] = [r for r in caplog.records if "dump employees" in r.getMessage()]
    msg = rec.getMessage()
    assert msg.startswith("dump employees: ") and msg.endswith("s")
    float(msg.split(": ")[1].rstrip("s"))  # parses as seconds


def test_log_time_logs_even_on_error(caplog):
    configure(1)
    with caplog.at_level(logging.INFO, logger="xdump_spark"):
        with pytest.raises(RuntimeError):
            with log_time("failing action"):
                raise RuntimeError("boom")
    assert any("failing action" in r.getMessage() for r in caplog.records)


def test_verbosity_zero_suppresses_info(caplog):
    configure(0)
    with caplog.at_level(logging.WARNING, logger="xdump_spark"):
        with log_time("quiet action"):
            pass
    assert not any("quiet action" in r.getMessage() for r in caplog.records)
