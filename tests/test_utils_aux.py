"""Aux-subsystem tests: logging, profiling report, config registry
(SURVEY.md §5 rows: metrics/logging, tracing/profiling, config system)."""

import logging

import numpy as np

from cuda_flashattention_tpu import config
from cuda_flashattention_tpu.utils.log import get_logger
from cuda_flashattention_tpu.utils.profiling import annotate, kernel_report
from cuda_flashattention_tpu.utils.testing import print_matrix


def test_logger_prefixes_process(capsys):
    log = get_logger("test")
    log.warning("hello %d", 7)
    err = capsys.readouterr().err
    assert "[p0]" in err and "hello 7" in err


def test_logger_level_env(monkeypatch):
    log = get_logger("lvl")
    assert isinstance(log, logging.Logger)
    log.debug("not shown at INFO")  # no assertion — must not raise


def test_kernel_report_math(capsys):
    out = kernel_report("toy", seconds=0.001, flops=1e9, bytes_moved=1e6)
    assert abs(out["tflops"] - 1.0) < 1e-9
    assert abs(out["gbps"] - 1.0) < 1e-9
    assert "toy" in capsys.readouterr().out


def test_annotate_is_cheap():
    with annotate("region"):
        x = np.ones(4).sum()
    assert x == 4.0


def test_config_registry():
    knobs = config.all_knobs()
    assert "TEST_TPU" in knobs and "COORD" in knobs
    assert config.NPROC.as_int >= 1
    text = config.describe()
    assert "CFA_LOG_LEVEL" in text


def test_print_matrix_truncates(capsys):
    print_matrix("m", np.arange(100, dtype=np.float32).reshape(10, 10))
    out = capsys.readouterr().out
    assert "m [" in out and "..." in out
