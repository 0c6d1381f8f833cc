"""Declarative arg registry (common/args.py — the common/arg.h analogue):
domain filtering, env-var mirrors, precedence cli > env > default."""
import os

import pytest

from llama_cpp_test_tpu.common.args import (REGISTRY, build_parser, env_docs,
                                            sampler_params_from_args)


def test_domain_filtering():
    ap = build_parser("t", examples=("server",))
    args = ap.parse_args(["-m", "x.gguf"])
    assert args.port == 8080 and args.parallel == 4
    with pytest.raises(SystemExit):
        ap.parse_args(["-m", "x.gguf", "--image", "a.png"])  # llava-only


def test_env_mirror_and_precedence(monkeypatch):
    monkeypatch.setenv("LLAMA_ARG_CTX_SIZE", "4096")
    monkeypatch.setenv("LLAMA_ARG_PORT", "9999")
    ap = build_parser("t", examples=("server",))
    args = ap.parse_args(["-m", "x.gguf"])
    assert args.ctx_size == 4096 and args.port == 9999
    args = ap.parse_args(["-m", "x.gguf", "--port", "1234"])
    assert args.port == 1234  # cli beats env


def test_env_model_satisfies_required(monkeypatch):
    monkeypatch.setenv("LLAMA_ARG_MODEL", "env.gguf")
    ap = build_parser("t")
    args = ap.parse_args([])
    assert args.model == "env.gguf"


def test_sampler_params_roundtrip():
    ap = build_parser("t", examples=("sampling",))
    args = ap.parse_args(["-m", "x.gguf", "--temp", "0.5", "--top-k", "7",
                          "--repeat-penalty", "1.3", "--seed", "42"])
    sp = sampler_params_from_args(args)
    assert sp.temp == 0.5 and sp.top_k == 7
    assert sp.penalty_repeat == 1.3 and sp.seed == 42


def test_env_docs_lists_mirrors():
    docs = env_docs()
    assert "LLAMA_ARG_MODEL" in docs and "LLAMA_ARG_TEMP" in docs
    n_env = sum(1 for a in REGISTRY if a.env)
    assert n_env >= 15


def test_logit_bias_parsing():
    from llama_cpp_test_tpu.common.args import parse_logit_bias

    assert parse_logit_bias(["1024+5", "7-2.5"]) == {1024: 5.0, 7: -2.5}
    import pytest as _p
    with _p.raises(ValueError):
        parse_logit_bias(["nope"])


def test_rope_overrides_resolve_arch(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_engine import make_tiny_gguf
    from llama_cpp_test_tpu.runtime.engine import Model

    path = str(tmp_path / "m.gguf")
    make_tiny_gguf(path)
    m = Model(path, kv_overrides={"*.rope.freq_base": 50000.0})
    assert m.reader.metadata["llama.rope.freq_base"] == 50000.0
    assert m.hp.rope_freq_base == 50000.0


def test_sampler_params_new_flags():
    from llama_cpp_test_tpu.cli.main import build_parser
    from llama_cpp_test_tpu.common.args import sampler_params_from_args

    args = build_parser().parse_args(
        ["-m", "x.gguf", "--xtc-probability", "0.3", "--dry-multiplier",
         "0.8", "--dynatemp-range", "0.5", "--top-n-sigma", "2.0",
         "-l", "5+3", "--json-schema", '{"type": "object"}'])
    sp = sampler_params_from_args(args)
    assert sp.xtc_probability == 0.3 and sp.dry_multiplier == 0.8
    assert sp.dynatemp_range == 0.5 and sp.top_n_sigma == 2.0
    assert sp.logit_bias == {5: 3.0}
    assert "root" in sp.grammar  # json schema converted to GBNF
