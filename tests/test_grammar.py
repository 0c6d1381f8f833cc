"""GBNF grammar tests (test-grammar-parser / test-grammar-integration
analogues)."""
import numpy as np
import pytest

from llama_cpp_test_tpu.runtime.grammar import Grammar, GrammarParser


def parse(src):
    return GrammarParser(src).parse()


def accepts(g: Grammar, text: str) -> bool:
    g.reset()
    for c in text:
        if not g.accept_char(ord(c)):
            return False
    return g.is_complete()


def test_literal():
    g = parse('root ::= "hello"')
    assert accepts(g, "hello")
    assert not accepts(g, "help")
    assert not accepts(g, "hell")  # incomplete


def test_alternatives():
    g = parse('root ::= "yes" | "no"')
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")


def test_char_class_and_ranges():
    g = parse("root ::= [a-z0-9]")
    for ch in "az059":
        assert accepts(g, ch), ch
    assert not accepts(g, "A")


def test_negated_class():
    g = parse('root ::= [^abc] ')
    assert accepts(g, "d")
    assert not accepts(g, "a")


def test_star_plus_question():
    g = parse('root ::= "a"* "b"+ "c"?')
    assert accepts(g, "b")
    assert accepts(g, "aaabbc")
    assert accepts(g, "bbb")
    assert not accepts(g, "a")
    assert not accepts(g, "ac")


def test_bounded_repetition():
    g = parse('root ::= [0-9]{2,4}')
    assert not accepts(g, "1")
    assert accepts(g, "12")
    assert accepts(g, "1234")
    assert not accepts(g, "12345")


def test_rule_refs_and_recursion():
    g = parse('''
root  ::= expr
expr  ::= term ("+" term)*
term  ::= [0-9]+ | "(" expr ")"
''')
    assert accepts(g, "1")
    assert accepts(g, "12+34")
    assert accepts(g, "(1+2)+3")
    assert not accepts(g, "1+")
    assert not accepts(g, "(1+2")


def test_json_like_grammar():
    g = parse('''
root   ::= object
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}" ws
value  ::= object | array | string | number | "true" | "false" | "null"
array  ::= "[" ws ( value ("," ws value)* )? "]" ws
string ::= "\\"" [a-zA-Z0-9_ ]* "\\""
number ::= "-"? [0-9]+ ("." [0-9]+)?
ws     ::= [ \\t\\n]*
''')
    assert accepts(g, '{}')
    assert accepts(g, '{"a": 1}')
    assert accepts(g, '{"a": [1, 2, {"b": "c"}]}')
    assert not accepts(g, '{"a": }')
    assert not accepts(g, '{a: 1}')


def test_escapes():
    g = parse(r'root ::= "\n" [\t\\-]')
    assert accepts(g, "\n\t")
    assert accepts(g, "\n\\")
    assert accepts(g, "\n-")
    assert not accepts(g, "\nx")


def test_missing_root_raises():
    with pytest.raises(ValueError):
        parse('start ::= "x"')


def test_undefined_rule_raises():
    with pytest.raises(ValueError):
        parse('root ::= missing')


def test_grammar_sampler_masks(tmp_path):
    from test_engine import make_tiny_gguf
    from llama_cpp_test_tpu.gguf.reader import GGUFReader
    from llama_cpp_test_tpu.runtime.grammar import GrammarSampler
    from llama_cpp_test_tpu.runtime.sampling import SampleState
    from llama_cpp_test_tpu.tokenizer import load_tokenizer

    path = str(tmp_path / "m.gguf")
    make_tiny_gguf(path)
    with GGUFReader(path) as r:
        tok = load_tokenizer(r)
    gs = GrammarSampler('root ::= [0-9]+', tok)
    n = tok.vocab.n_tokens
    st = SampleState.from_logits(np.zeros(n, np.float32))
    gs.apply(st)
    st.softmax()
    # surviving candidates must all decode to digit-compatible pieces
    kept = [int(t) for t, lg in zip(st.ids, st.logits) if np.isfinite(lg)]
    assert kept
    for t in kept[:20]:
        piece = tok.token_to_piece(t)
        assert piece and all(c in "0123456789" for c in piece), (t, piece)
    # accept a digit then EOG-completability
    gs.accept(kept[0])
    assert gs.grammar.is_complete()


def test_lazy_grammar_trigger_word(tmp_path):
    """Lazy grammar (llama-grammar.h:124-132): unconstrained until the
    trigger word appears in output; constrained from the trigger onward."""
    import numpy as np
    from test_engine import make_tiny_gguf

    from llama_cpp_test_tpu.gguf.reader import GGUFReader
    from llama_cpp_test_tpu.runtime.grammar import GrammarSampler
    from llama_cpp_test_tpu.runtime.sampling import SampleState
    from llama_cpp_test_tpu.tokenizer import load_tokenizer

    path = str(tmp_path / "m.gguf")
    make_tiny_gguf(path)
    with GGUFReader(path) as r:
        tok = load_tokenizer(r)
    gs = GrammarSampler('root ::= "<t>" [0-9]+', tok, lazy=True,
                        trigger_words=("<t>",))
    n = tok.vocab.n_tokens
    # before the trigger: no masking at all
    st = SampleState.from_logits(np.zeros(n, np.float32))
    gs.apply(st)
    assert np.isfinite(st.logits).all()
    # free-text tokens accepted without constraining
    for ch in "hi ":
        tid = next(t for t in range(n) if tok.token_to_piece(t) == ch)
        gs.accept(tid)
    assert gs.awaiting_trigger
    # the trigger word arrives (piece-by-piece across tokens)
    for ch in "<t>":
        tid = next(t for t in range(n) if tok.token_to_piece(t) == ch)
        gs.accept(tid)
    assert not gs.awaiting_trigger
    # now constrained: only digit pieces survive
    st = SampleState.from_logits(np.zeros(n, np.float32))
    gs.apply(st)
    kept = [int(t) for t, lg in zip(st.ids, st.logits) if np.isfinite(lg)]
    assert kept
    for t in kept[:20]:
        piece = tok.token_to_piece(t)
        assert piece and all(c in "0123456789" for c in piece), (t, piece)


def test_lazy_grammar_trigger_token(tmp_path):
    import numpy as np
    from test_engine import make_tiny_gguf

    from llama_cpp_test_tpu.gguf.reader import GGUFReader
    from llama_cpp_test_tpu.runtime.grammar import GrammarSampler
    from llama_cpp_test_tpu.runtime.sampling import SampleState
    from llama_cpp_test_tpu.tokenizer import load_tokenizer

    path = str(tmp_path / "m2.gguf")
    make_tiny_gguf(path)
    with GGUFReader(path) as r:
        tok = load_tokenizer(r)
    n = tok.vocab.n_tokens
    trig = next(t for t in range(n) if tok.token_to_piece(t) == "7")
    gs = GrammarSampler('root ::= [0-9]+', tok, lazy=True,
                        trigger_tokens=(trig,))
    assert gs.awaiting_trigger
    gs.accept(next(t for t in range(n) if tok.token_to_piece(t) == "x"))
    assert gs.awaiting_trigger
    gs.accept(trig)  # trigger token's own piece feeds the grammar
    assert not gs.awaiting_trigger
    st = SampleState.from_logits(np.zeros(n, np.float32))
    gs.apply(st)
    kept = [int(t) for t, lg in zip(st.ids, st.logits) if np.isfinite(lg)]
    assert kept
