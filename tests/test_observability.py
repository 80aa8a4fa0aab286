"""cfg logging stack, maths helpers, profiling subsystem."""

import logging

import numpy as np

from archnemesis_tpu.cfg import (
    pkg_logger,
    pop_packagewide_level,
    push_packagewide_level,
    quiet,
    set_packagewide_level,
)
from archnemesis_tpu.utils.maths import (
    is_diagonal,
    is_monotonically_increasing,
    ngauss,
)
from archnemesis_tpu.utils.profiling import (
    Timings,
    annotate,
    device_memory_report,
    stopwatch,
)


def test_push_pop_level_stack():
    child = logging.getLogger("archnemesis_tpu.test_child")
    child.setLevel(logging.DEBUG)
    before = (pkg_logger.level, child.level)
    push_packagewide_level(logging.ERROR)
    assert pkg_logger.level == logging.ERROR
    assert child.level == logging.ERROR
    pop_packagewide_level()
    assert (pkg_logger.level, child.level) == before


def test_quiet_context_max_mode():
    child = logging.getLogger("archnemesis_tpu.test_child2")
    child.setLevel(logging.CRITICAL)
    with quiet(logging.WARNING):
        # 'max' mode must not lower an already-stricter logger
        assert child.level == logging.CRITICAL
        assert pkg_logger.level >= logging.WARNING
    set_packagewide_level(logging.INFO)


def test_is_diagonal_non_mutating():
    a = np.diag([1.0, 2.0, 3.0])
    assert is_diagonal(a)
    a[0, 1] = 5.0
    a_copy = a.copy()
    assert not is_diagonal(a)
    np.testing.assert_array_equal(a, a_copy)  # input not clobbered
    assert not is_diagonal(np.ones((2, 3)))


def test_monotonic():
    assert is_monotonically_increasing(np.array([1.0, 2.0, 5.0]))
    assert not is_monotonically_increasing(np.array([1.0, 1.0, 5.0]))


def test_ngauss_peak_values():
    x = np.linspace(-5, 5, 1001)
    y = ngauss(x, amp=[2.0, 1.0], mean=[-1.0, 2.0], fwhm=[0.5, 1.0])
    assert y[np.argmin(np.abs(x + 1.0))] > 1.9
    assert y[np.argmin(np.abs(x - 2.0))] > 0.9
    assert y[0] < 1e-6


def test_stopwatch_synchronises_device_result():
    import jax.numpy as jnp

    reg = Timings()
    with stopwatch("matmul", registry=reg) as box:
        box[0] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    s = reg.summary()["matmul"]
    assert s["count"] == 1 and s["total_s"] > 0
    assert "matmul" in reg.report()


def test_annotate_and_memory_report_run():
    import jax.numpy as jnp

    with annotate("test-region"):
        (jnp.arange(8.0) * 2).block_until_ready()
    report = device_memory_report()
    assert isinstance(report, dict)  # CPU backend: usually {}
