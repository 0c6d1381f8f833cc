"""CLI smoke tests (llama-cli analogue), driving the real argv entry point."""
import io
import os
import sys

import numpy as np

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


def test_hellaswag_scorer(model_path):
    """Labels set to the model's own preference => 100% accuracy; flipped
    labels => 0% (exercises parsing + length-normalized scoring)."""
    from llama_cpp_test_tpu.cli.perplexity import (_ending_logprob,
                                                   hellaswag_score)
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path)
    tok = m.tokenizer
    ctx = Context(m, n_ctx=128, n_seq_max=1, block_size=8)
    tasks = [("walking: the dog", ["ran fast", "sat down",
                                   "flew away quickly", "is blue"]),
             ("cooking: the pot", ["boiled over", "sang a song",
                                   "went home", "was hot"])]
    lines = []
    for context, endings in tasks:
        ctx_ids = tok.encode(context, add_special=True)
        scores = []
        for e in endings:
            full = tok.encode(context + " " + e, add_special=True)
            lp, cnt = _ending_logprob(ctx, ctx_ids, full)
            scores.append(lp / max(cnt, 1))
        gold = int(np.argmax(scores))
        lines += [context, str(gold)] + endings
    acc = hellaswag_score(ctx, tok, "\n".join(lines))
    assert acc == 100.0
    # flip the labels
    for i in (1, 7):
        lines[i] = str((int(lines[i]) + 1) % 4)
    acc = hellaswag_score(ctx, tok, "\n".join(lines))
    assert acc == 0.0


def test_winogrande_scorer(model_path):
    from llama_cpp_test_tpu.cli.perplexity import (_ending_logprob,
                                                   winogrande_score)
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path)
    tok = m.tokenizer
    ctx = Context(m, n_ctx=128, n_seq_max=1, block_size=8)
    first, second = "the trophy does not fit because ", " is too big"
    o1, o2 = "the trophy", "the case"
    scores = []
    for choice in (o1, o2):
        ctx_ids = tok.encode(first + choice, add_special=True)
        full = tok.encode(first + choice + second, add_special=True)
        lp, cnt = _ending_logprob(ctx, ctx_ids, full)
        scores.append(lp / max(cnt, 1))
    answer = int(np.argmax(scores)) + 1
    csv_text = f'1,"{first}_{second}","{o1}","{o2}",{answer}\n'
    assert winogrande_score(ctx, tok, csv_text) == 100.0
    wrong = 2 if answer == 1 else 1
    csv_text = f'1,"{first}_{second}","{o1}","{o2}",{wrong}\n'
    assert winogrande_score(ctx, tok, csv_text) == 0.0


def test_multiple_choice_scorer(model_path):
    import json as _json

    from llama_cpp_test_tpu.cli.perplexity import (_ending_logprob,
                                                   multiple_choice_score)
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path)
    tok = m.tokenizer
    ctx = Context(m, n_ctx=128, n_seq_max=1, block_size=8)
    q = "the sky is"
    choices = ["blue today", "a potato", "running late"]
    ctx_ids = tok.encode(q, add_special=True)
    scores = []
    for c in choices:
        full = tok.encode(q + " " + c, add_special=True)
        lp, cnt = _ending_logprob(ctx, ctx_ids, full)
        scores.append(lp / max(cnt, 1))
    gold = int(np.argmax(scores))
    text = _json.dumps([{"question": q, "choices": choices, "answer": gold}])
    assert multiple_choice_score(ctx, tok, text) == 100.0


def test_tokenize_cli(model_path, capsys):
    from llama_cpp_test_tpu.cli.tokenize import main as tmain

    rc = tmain(["-m", model_path, "-p", "hello world", "--show-count"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "->" in out and "Total number of tokens:" in out

    rc = tmain(["-m", model_path, "-p", "hi", "--ids"])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    assert out.startswith("[") and out.endswith("]")


def test_gbnf_validator_cli(tmp_path, capsys):
    from llama_cpp_test_tpu.cli.gbnf_validator import main as gmain

    gpath = str(tmp_path / "g.gbnf")
    with open(gpath, "w") as f:
        f.write('root ::= "yes" | "no"\n')
    ok_path = str(tmp_path / "ok.txt")
    with open(ok_path, "w") as f:
        f.write("yes")
    bad_path = str(tmp_path / "bad.txt")
    with open(bad_path, "w") as f:
        f.write("maybe")
    assert gmain([gpath, ok_path]) == 0
    assert "valid" in capsys.readouterr().out
    assert gmain([gpath, bad_path]) == 1
    assert "invalid" in capsys.readouterr().out
    # incomplete parse: prefix of a valid word
    inc_path = str(tmp_path / "inc.txt")
    with open(inc_path, "w") as f:
        f.write("ye")
    assert gmain([gpath, inc_path]) == 1


def test_quantize_stats_cli(model_path, capsys):
    from llama_cpp_test_tpu.cli.quantize_stats import main as qsmain

    rc = qsmain(["-m", model_path, "-t", "Q8_0", "--per-layer"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "overall rmse" in out
    # Q8_0 round-trip error should be small
    import re

    m = re.search(r"overall rmse ([0-9.]+)", out)
    assert m and float(m.group(1)) < 0.01


def test_save_load_state_cli(model_path, tmp_path, capsys):
    from llama_cpp_test_tpu.cli.save_load_state import main as slmain

    rc = slmain(["-m", model_path, "-n", "8",
                 "--state-file", str(tmp_path / "st.npz")])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "OK: restored continuation matches" in out


def test_llama_bench_cli(model_path, capsys):
    from llama_cpp_test_tpu.cli.llama_bench import main as bmain

    rc = bmain(["-m", model_path, "-p", "16", "-n", "4", "-r", "2",
                "-o", "jsonl"])
    assert rc == 0
    import json as _json

    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rows = [_json.loads(l) for l in lines]
    tests = {r["test"] for r in rows}
    assert tests == {"pp16", "tg4"}
    for r in rows:
        assert r["avg_ts"] > 0 and "backend" in r

    rc = bmain(["-m", model_path, "-p", "0", "-n", "4", "-r", "2",
                "-pg", "8,4", "-o", "md"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "| model |" in out and "pp8+tg4" in out


def test_batched_cli(model_path, capsys):
    from llama_cpp_test_tpu.cli.batched import main as bmain

    rc = bmain(["-m", model_path, "-p", "hi", "-np", "3", "-n", "6",
                "--temp", "0.8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sequence 0:" in out and "sequence 2:" in out


def test_parallel_cli(model_path, capsys):
    from llama_cpp_test_tpu.cli.parallel import main as pmain

    rc = pmain(["-m", model_path, "-ns", "5", "-np", "2", "-n", "6",
                "-c", "128"])
    assert rc == 0
    cap = capsys.readouterr()
    assert "=== request 4" in cap.out
    assert "aggregate" in cap.err


def test_embedding_cli(model_path, capsys):
    from llama_cpp_test_tpu.cli.embedding import main as emain

    rc = emain(["-m", model_path, "-p", "hello", "-p", "world",
                "--similarity"])
    assert rc == 0
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines() if l and not l.startswith("cosine")]
    assert len(rows) == 2
    # self-similarity on the diagonal is 1.00 after L2 norm
    assert rows[0].split()[0] == "1.00"

    rc = emain(["-m", model_path, "-p", "hello",
                "--embd-output-format", "json"])
    assert rc == 0
    import json as _json

    data = _json.loads(capsys.readouterr().out)
    assert data["data"][0]["object"] == "embedding"


def test_retrieval_cli(model_path, tmp_path, capsys):
    from llama_cpp_test_tpu.cli.retrieval import main as rmain

    doc = tmp_path / "doc.txt"
    doc.write_text("the sky is blue today\n" * 3 +
                   "bananas are yellow fruit\n" * 3)
    rc = rmain(["-m", model_path, "-f", str(doc), "--chunk-size", "40",
                "--top-k", "2", "--query", "the sky is blue today"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "top 1" in out and "top 2" in out


def test_speculative_cli(model_path, capsys):
    from llama_cpp_test_tpu.cli.speculative import main as smain

    # self-speculation: target == draft
    rc = smain(["-m", model_path, "-md", model_path, "-p", "hi",
                "-n", "10", "--n-draft", "4"])
    assert rc == 0
    cap = capsys.readouterr()
    assert "accepted" in cap.err

    rc = smain(["-m", model_path, "-md", model_path, "-p", "hi",
                "-n", "10", "--n-draft", "4", "-ns", "3"])
    assert rc == 0
    assert "splits" in capsys.readouterr().err


def test_prompt_cache_session_file(model_path, tmp_path, capsys):
    """--prompt-cache: second run with the same prompt restores the KV and
    prefills at most one token (main.cpp:237-255 session files)."""
    sess = str(tmp_path / "session.bin")
    args = ["-m", model_path, "-p", "hello world", "-n", "4",
            "--prompt-cache", sess, "--no-display-prompt"]
    rc, out1 = run_cli(args)
    capsys.readouterr()
    assert rc == 0 and os.path.exists(sess)
    rc, out2 = run_cli(args)
    err2 = capsys.readouterr().err
    assert rc == 0
    assert "session restored" in err2
    assert out2 == out1  # greedy continuation identical from restored KV


def test_reverse_prompt_stops(model_path):
    # find what greedy emits, then use a piece of it as the reverse prompt
    rc, full = run_cli(["-m", model_path, "-p", "hi", "-n", "8",
                        "--no-display-prompt", "--temp", "0"])
    assert rc == 0 and len(full) > 2
    stop = full[len(full) // 2:len(full) // 2 + 2]
    rc, cut = run_cli(["-m", model_path, "-p", "hi", "-n", "8",
                       "--no-display-prompt", "--temp", "0",
                       "-r", stop])
    assert rc == 0
    assert len(cut) <= len(full)


def test_override_kv(model_path):
    rc, _ = run_cli(["-m", model_path, "-p", "hi", "-n", "2",
                     "--override-kv", "llama.context_length=int:128",
                     "--no-display-prompt"])
    assert rc == 0
    # direct Model-level check: override reaches hparams
    from llama_cpp_test_tpu.runtime.engine import Model

    m = Model(model_path, kv_overrides={"llama.context_length": 128})
    assert m.hp.n_ctx_train == 128
    assert m.reader.metadata["llama.context_length"] == 128


def test_parse_kv_overrides():
    from llama_cpp_test_tpu.common.args import parse_kv_overrides

    out = parse_kv_overrides([
        "a.b=int:4", "c=float:1.5", "d=bool:true", "e=str:hi"])
    assert out == {"a.b": 4, "c": 1.5, "d": True, "e": "hi"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_kv_overrides(["bad"])
    with _pytest.raises(ValueError):
        parse_kv_overrides(["x=weird:1"])


def test_infill_cli(model_path):
    """llama-infill: FIM tokens injected via --override-kv on the tiny
    model; PSM prompt + dedicated infill sampler generate a completion."""
    from llama_cpp_test_tpu.cli.infill import main as imain

    old_out = sys.stdout
    sys.stdout = io.StringIO()
    try:
        rc = imain(["-m", model_path, "--in-prefix", "ab",
                    "--in-suffix", "cd", "-n", "4", "--temp", "0",
                    "--override-kv", "tokenizer.ggml.fim_pre_token_id=int:5",
                    "--override-kv", "tokenizer.ggml.fim_suf_token_id=int:6",
                    "--override-kv", "tokenizer.ggml.fim_mid_token_id=int:7"])
    finally:
        sys.stdout = old_out
    assert rc == 0


def test_infill_cli_no_fim_tokens(model_path):
    from llama_cpp_test_tpu.cli.infill import main as imain

    rc = imain(["-m", model_path, "--in-prefix", "x", "--in-suffix", "y"])
    assert rc == 1  # clean error, not a crash


def test_gritlm_cli(model_path, capsys):
    """gritlm: non-causal embeddings + cosine scores + generation in one
    run (reference examples/gritlm)."""
    from llama_cpp_test_tpu.cli.gritlm import main as gmain

    rc = gmain(["-m", model_path, "--doc", "alpha beta", "--doc", "gamma",
                "--query", "alpha", "-p", "hello", "-n", "3", "--temp", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("cosine(") == 2


def test_embed_noncausal_differs_from_causal(model_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path)
    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    toks = [3, 17, 42, 9, 5]
    e_causal = ctx.embed(toks, pooling="mean", causal=True)
    e_bi = ctx.embed(toks, pooling="mean", causal=False)
    # both unit-norm, but bidirectional attention changes the pooled vector
    assert abs(np.linalg.norm(e_causal) - 1) < 1e-4
    assert abs(np.linalg.norm(e_bi) - 1) < 1e-4
    assert float(np.dot(e_causal, e_bi)) < 0.9999
