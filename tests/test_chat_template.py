"""Chat template builtins + detection + tool-call parsing
(the test-chat-template.cpp analogue)."""
import pytest

from llama_cpp_test_tpu.server.chat import (_BUILTINS, apply_chat_template,
                                            detect_template, parse_tool_calls)

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello"},
    {"role": "user", "content": "Bye"},
]


def test_builtin_count_and_nonempty():
    assert len(_BUILTINS) >= 25
    for name, fn in _BUILTINS.items():
        out = fn(MSGS, True)
        assert isinstance(out, str) and "Hi" in out, name


@pytest.mark.parametrize("name,needle", [
    ("chatml", "<|im_start|>assistant\n"),
    ("llama2", "[INST] <<SYS>>\nYou are helpful.\n<</SYS>>\n\nHi [/INST]"),
    ("llama3", "<|start_header_id|>assistant<|end_header_id|>"),
    ("phi3", "<|assistant|>\n"),
    ("gemma", "<start_of_turn>model"),
    ("command-r", "<|CHATBOT_TOKEN|>"),
    ("zephyr", "<|endoftext|>"),
    ("deepseek3", "<｜Assistant｜>"),
    ("granite", "<|start_of_role|>assistant<|end_of_role|>"),
])
def test_builtin_formats(name, needle):
    out = _BUILTINS[name](MSGS, True)
    assert needle in out, out


def test_detect_from_jinja_source():
    assert detect_template("{% if x %}<|im_start|>{{role}}") == "chatml"
    assert detect_template("...<<SYS>>...") == "llama2-sys"
    assert detect_template("...<|start_header_id|>...") == "llama3"
    assert detect_template("...<start_of_turn>...") == "gemma"
    assert detect_template("no markers at all") == "chatml"


def test_apply_named_builtin():
    out = apply_chat_template({}, MSGS, template_override="gemma")
    assert "<start_of_turn>model" in out


def test_apply_jinja_with_tools():
    tmpl = ("{% for m in messages %}{{ m.role }}: {{ m.content }}\n"
            "{% endfor %}{% if tools %}TOOLS={{ tools | length }}{% endif %}")
    out = apply_chat_template({"tokenizer.chat_template": tmpl}, MSGS,
                              tools=[{"type": "function"}])
    assert "TOOLS=1" in out


def test_broken_jinja_falls_back_to_detected():
    tmpl = "{% invalid syntax <|start_header_id|> %}"
    out = apply_chat_template({"tokenizer.chat_template": tmpl}, MSGS)
    assert "<|eot_id|>" in out  # llama3 builtin used


def test_parse_tool_calls_chatml():
    text = ('I will check.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}\n</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content == "I will check."
    assert calls[0]["function"]["name"] == "get_weather"
    assert '"Paris"' in calls[0]["function"]["arguments"]


def test_parse_tool_calls_mistral():
    text = '[TOOL_CALLS][{"name": "f", "arguments": {"x": 1}}]'
    content, calls = parse_tool_calls(text)
    assert calls and calls[0]["function"]["name"] == "f"


def test_parse_tool_calls_bare_json():
    content, calls = parse_tool_calls('{"name": "f", "arguments": {}}')
    assert calls and content == ""


def test_parse_tool_calls_plain_text():
    content, calls = parse_tool_calls("just a normal answer")
    assert calls == [] and content == "just a normal answer"
