"""Leveled async logger (common/log.py — the common/log.cpp analogue)."""
import io
import time


def test_levels_and_async_drain():
    from llama_cpp_test_tpu.common.log import Logger

    sink = io.StringIO()
    lg = Logger(sink)
    lg.set_level("warn")
    lg.info("hidden %d", 1)
    lg.warn("shown %s", "w")
    lg.error("err")
    lg.flush()
    out = sink.getvalue()
    assert "hidden" not in out
    assert "W shown w" in out and "E err" in out


def test_timestamps(monkeypatch):
    monkeypatch.setenv("LLAMA_LOG_TIMESTAMPS", "1")
    import io

    from llama_cpp_test_tpu.common.log import Logger

    sink = io.StringIO()
    lg = Logger(sink)
    lg.info("hello")
    lg.flush()
    import re
    assert re.search(r"\d\d:\d\d:\d\d\.\d\d\d I hello", sink.getvalue())


def test_hot_path_never_blocks():
    from llama_cpp_test_tpu.common.log import Logger

    class SlowSink:
        def write(self, s):
            time.sleep(0.05)

        def flush(self):
            pass

    lg = Logger(SlowSink())
    t0 = time.perf_counter()
    for i in range(5000):  # far beyond the queue bound
        lg.info("m %d", i)
    assert time.perf_counter() - t0 < 1.0  # drops instead of blocking
