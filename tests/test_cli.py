"""CLI smoke tests (llama-cli analogue), driving the real argv entry point."""
import io
import sys

import pytest

from test_engine import make_tiny_gguf


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    return path


def run_cli(argv):
    from llama_cpp_test_tpu.cli.main import main

    old_out = sys.stdout
    sys.stdout = io.StringIO()
    try:
        rc = main(argv)
        out = sys.stdout.getvalue()
    finally:
        sys.stdout = old_out
    return rc, out


def test_one_shot_generation(model_path):
    rc, out = run_cli(["-m", model_path, "-p", "hello", "-n", "6",
                       "--temp", "0"])
    assert rc == 0
    assert out.startswith("hello")


def test_empty_prompt_errors(model_path):
    rc, _ = run_cli(["-m", model_path, "-n", "4"])
    assert rc == 1


def test_quantize_cli(tmp_path, model_path):
    from llama_cpp_test_tpu.quant.quantize_model import main as qmain

    dst = str(tmp_path / "out.gguf")
    rc = qmain([model_path, dst, "Q8_0"])
    assert rc == 0
    rc2, out = run_cli(["-m", dst, "-p", "hi", "-n", "4", "--temp", "0"])
    assert rc2 == 0


def test_perplexity_cli(tmp_path, model_path):
    from llama_cpp_test_tpu.cli.perplexity import main as pmain

    text = tmp_path / "text.txt"
    text.write_text("hello world " * 200)
    rc = pmain(["-m", model_path, "-f", str(text), "-c", "32",
                "--chunks", "2"])
    assert rc == 0
