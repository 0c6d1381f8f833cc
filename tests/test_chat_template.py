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


def test_llama2_multiturn_assistant_terminator():
    """Assistant turns end with </s> before the next [INST] (reference
    src/llama-chat.cpp LLM_CHAT_TEMPLATE_LLAMA_2*)."""
    out = _BUILTINS["llama2"](MSGS, True)
    assert "Hello</s>[INST] Bye [/INST]" in out


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


# -- model-specific tool-call formats (reference test-chat.cpp cases) --------


def test_detect_tool_format():
    from llama_cpp_test_tpu.server.chat import detect_tool_format

    assert detect_tool_format("...<｜tool▁calls▁begin｜>...") == "deepseek_r1"
    assert detect_tool_format("x<|END_THINKING|><|START_ACTION|>y") == \
        "command_r7b"
    assert detect_tool_format("a <tool_call> b") == "hermes_2_pro"
    assert detect_tool_format(">>>all\n") == "functionary_v3_2"
    assert detect_tool_format(
        "<|start_header_id|> ... <function=") == "functionary_v3_1"
    assert detect_tool_format(
        "<|start_header_id|>ipython<|end_header_id|> <|python_tag|>"
    ) == "llama_3_x_builtin"
    assert detect_tool_format(
        "<|start_header_id|>ipython<|end_header_id|>") == "llama_3_x"
    assert detect_tool_format("[TOOL_CALLS]") == "mistral_nemo"
    assert detect_tool_format("{% for m in messages %}") == "generic"


def test_parse_llama3_json_call():
    from llama_cpp_test_tpu.server.chat import parse_assistant_message

    out = parse_assistant_message(
        '{"name": "get_weather", "parameters": {"city": "Paris"}}',
        fmt="llama_3_x")
    assert len(out["tool_calls"]) == 1
    fc = out["tool_calls"][0]["function"]
    assert fc["name"] == "get_weather"
    import json
    assert json.loads(fc["arguments"]) == {"city": "Paris"}
    assert out["content"] == ""


def test_parse_llama3_builtin_python_tag():
    from llama_cpp_test_tpu.server.chat import parse_assistant_message

    out = parse_assistant_message(
        '<|python_tag|>wolfram_alpha.call(query="2+2")',
        fmt="llama_3_x_builtin")
    assert len(out["tool_calls"]) == 1
    fc = out["tool_calls"][0]["function"]
    assert fc["name"] == "wolfram_alpha"
    import json
    assert json.loads(fc["arguments"]) == {"query": "2+2"}


def test_parse_deepseek_r1_reasoning_and_call():
    from llama_cpp_test_tpu.server.chat import parse_assistant_message

    text = ("<think>I should look this up.</think>Sure."
            "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>search\n```json\n{\"q\": \"tpu\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
    out = parse_assistant_message(text, fmt="deepseek_r1",
                                  extract_reasoning=True)
    assert out["reasoning_content"] == "I should look this up."
    assert out["content"] == "Sure."
    assert len(out["tool_calls"]) == 1
    assert out["tool_calls"][0]["function"]["name"] == "search"

    # without extraction the <think> block stays in content
    out2 = parse_assistant_message(text, fmt="deepseek_r1",
                                   extract_reasoning=False)
    assert out2["reasoning_content"] == ""
    assert out2["content"].startswith("<think>")


def test_parse_functionary_v3_2():
    from llama_cpp_test_tpu.server.chat import parse_assistant_message
    import json

    out = parse_assistant_message(
        'all\nHello there>>>get_time\n{"tz": "UTC"}',
        fmt="functionary_v3_2")
    assert out["content"] == "Hello there"
    assert out["tool_calls"][0]["function"]["name"] == "get_time"
    assert json.loads(out["tool_calls"][0]["function"]["arguments"]) == \
        {"tz": "UTC"}


def test_parse_functionary_v3_1():
    from llama_cpp_test_tpu.server.chat import parse_assistant_message
    import json

    out = parse_assistant_message(
        '<function=calc>{"expr": "1+1"}</function>', fmt="functionary_v3_1")
    assert out["tool_calls"][0]["function"]["name"] == "calc"
    assert json.loads(out["tool_calls"][0]["function"]["arguments"]) == \
        {"expr": "1+1"}


def test_parse_hermes_with_reasoning():
    from llama_cpp_test_tpu.server.chat import parse_assistant_message
    import json

    out = parse_assistant_message(
        '<think>hm</think><tool_call>{"name": "f", "arguments": {"a": 1}}'
        '</tool_call>', fmt="hermes_2_pro", extract_reasoning=True)
    assert out["reasoning_content"] == "hm"
    assert out["tool_calls"][0]["function"]["name"] == "f"
    assert json.loads(out["tool_calls"][0]["function"]["arguments"]) == \
        {"a": 1}


def test_parse_command_r7b():
    from llama_cpp_test_tpu.server.chat import parse_assistant_message
    import json

    text = ('<|START_THINKING|>plan<|END_THINKING|>'
            '<|START_ACTION|>[{"tool_call_id": "0", "tool_name": "lookup", '
            '"parameters": {"k": "v"}}]<|END_ACTION|>')
    out = parse_assistant_message(text, fmt="command_r7b",
                                  extract_reasoning=True)
    assert out["reasoning_content"] == "plan"
    assert out["tool_calls"][0]["function"]["name"] == "lookup"
    assert json.loads(out["tool_calls"][0]["function"]["arguments"]) == \
        {"k": "v"}

    resp = parse_assistant_message(
        "<|START_RESPONSE|>hi there<|END_RESPONSE|>", fmt="command_r7b")
    assert resp["content"] == "hi there" and not resp["tool_calls"]


# -- SSE stream parsing -------------------------------------------------------

def _stream_all(text, fmt, extract=True, chunk=3):
    """Feed text in small chunks; return (deltas, parsed)."""
    from llama_cpp_test_tpu.server.chat import StreamParser

    p = StreamParser(fmt, extract_reasoning=extract)
    deltas = []
    for i in range(0, len(text), chunk):
        deltas.extend(p.feed(text[i:i + chunk]))
    tail, parsed = p.finish()
    return deltas + tail, parsed


def _joined(deltas, key):
    return "".join(d.get(key, "") for d in deltas)


def test_stream_hermes_tool_call_heldback():
    text = ('Sure, calling it now. <tool_call>{"name": "f", '
            '"arguments": {"a": 1}}</tool_call>')
    for chunk in (1, 3, 7, 50):
        deltas, parsed = _stream_all(text, "hermes_2_pro", chunk=chunk)
        assert "<tool_call>" not in _joined(deltas, "content")
        assert _joined(deltas, "content").startswith("Sure, calling it now.")
        assert parsed["tool_calls"][0]["function"]["name"] == "f"


def test_stream_reasoning_deltas():
    text = ("<think>step one.\nstep two.</think>The answer is 4."
            "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>search\n```json\n{\"q\": \"x\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
    deltas, parsed = _stream_all(text, "deepseek_r1", chunk=4)
    r = _joined(deltas, "reasoning_content")
    c = _joined(deltas, "content")
    assert r == "step one.\nstep two."
    assert c == "The answer is 4."
    assert "tool▁calls" not in c and "<think>" not in c
    assert parsed["tool_calls"][0]["function"]["name"] == "search"
    # incremental deltas actually arrived DURING the stream, not only at
    # finish (at least one content delta before the tool block completes)
    assert any("reasoning_content" in d for d in deltas)


def test_stream_false_trigger_recovers_at_finish():
    # a lone '{' mid-content holds back streaming; the end-of-stream diff
    # flushes it once the full parse shows no tool call
    text = 'The set {1, 2} has two elements.'
    deltas, parsed = _stream_all(text, "llama_3_x", chunk=5)
    assert _joined(deltas, "content") == text
    assert parsed["tool_calls"] == []


def test_stream_command_r7b_response_markers_stripped():
    text = "<|START_RESPONSE|>All good.<|END_RESPONSE|>"
    deltas, parsed = _stream_all(text, "command_r7b", chunk=3)
    c = _joined(deltas, "content")
    assert "START_RESPONSE" not in c and "END_RESPONSE" not in c
    assert c.strip() == "All good."


def test_stream_command_r7b_action_buffered():
    text = ('<|START_ACTION|>[{"tool_name": "calc", "parameters": '
            '{"x": 2}}]<|END_ACTION|>')
    deltas, parsed = _stream_all(text, "command_r7b", chunk=6)
    assert _joined(deltas, "content") == ""
    assert parsed["tool_calls"][0]["function"]["name"] == "calc"


def test_stream_functionary_v32_header_stripped():
    text = 'all\nHello there>>>get_time\n{"tz": "UTC"}'
    deltas, parsed = _stream_all(text, "functionary_v3_2", chunk=2)
    c = _joined(deltas, "content")
    assert c == "Hello there"
    assert parsed["tool_calls"][0]["function"]["name"] == "get_time"


def test_stream_content_only_verbatim():
    text = 'Plain text with <tool_call> markup kept {"as": "is"}.'
    deltas, parsed = _stream_all(text, "content_only", chunk=4,
                                 extract=False)
    assert _joined(deltas, "content") == text
    assert parsed["tool_calls"] == []


def test_firefunction_v2_tool_calls():
    """FireFunction-v2 ' functools[...]' prefixed call array (reference
    common_chat_parse_firefunction_v2, common/chat.cpp:1192)."""
    import json

    from llama_cpp_test_tpu.server.chat import (detect_tool_format,
                                                parse_assistant_message)

    assert detect_tool_format(
        '{{" functools[" if tools else ""}}') == "firefunction_v2"
    out = parse_assistant_message(
        ' functools[{"name": "get_weather", "arguments": {"city": "SF"}},'
        ' {"name": "now", "arguments": {}}]', fmt="firefunction_v2")
    assert len(out["tool_calls"]) == 2
    assert out["tool_calls"][0]["function"]["name"] == "get_weather"
    assert json.loads(
        out["tool_calls"][0]["function"]["arguments"]) == {"city": "SF"}
    assert out["content"] == ""
    # plain text passes through
    out2 = parse_assistant_message("no calls here", fmt="firefunction_v2")
    assert out2["tool_calls"] == [] and out2["content"] == "no calls here"


def test_stream_incremental_argument_deltas():
    """Arguments stream as OpenAI-style fragments DURING the tool block
    (the reference's incremental common_chat_msg_diff), not one whole
    call at finish."""
    import json

    text = ('Okay. <tool_call>{"name": "get_weather", '
            '"arguments": {"city": "San Francisco", "unit": "C"}}'
            '</tool_call>')
    deltas, parsed = _stream_all(text, "hermes_2_pro", chunk=3)
    tc = [d["tool_calls"][0] for d in deltas if "tool_calls" in d]
    assert tc, "no tool_call deltas streamed"
    header = tc[0]
    assert header["function"]["name"] == "get_weather"
    assert header["id"] == "call_0" and header["index"] == 0
    frags = [c["function"]["arguments"] for c in tc
             if "arguments" in c["function"]]
    # multiple argument fragments arrived (incremental, not whole-call)
    assert len([f for f in frags if f]) >= 3, frags
    streamed = "".join(frags)
    final_args = parsed["tool_calls"][0]["function"]["arguments"]
    assert streamed == final_args  # stream and final message agree
    assert json.loads(streamed) == {"city": "San Francisco", "unit": "C"}


def test_stream_multiple_calls_indexed():
    import json

    text = ('[TOOL_CALLS][{"name": "a", "arguments": {"x": 1}}, '
            '{"name": "b", "arguments": {"y": {"z": 2}}}]')
    deltas, parsed = _stream_all(text, "mistral_nemo", chunk=4)
    tc = [d["tool_calls"][0] for d in deltas if "tool_calls" in d]
    idx0 = [c for c in tc if c["index"] == 0]
    idx1 = [c for c in tc if c["index"] == 1]
    assert idx0 and idx1
    assert idx0[0]["function"]["name"] == "a"
    assert idx1[0]["function"]["name"] == "b"
    a0 = "".join(c["function"].get("arguments", "") for c in idx0)
    a1 = "".join(c["function"].get("arguments", "") for c in idx1)
    assert json.loads(a0) == {"x": 1}
    assert json.loads(a1) == {"y": {"z": 2}}
    assert len(parsed["tool_calls"]) == 2


def test_stream_unsupported_format_whole_call_at_finish():
    """functionary-style markup still arrives as whole calls at finish."""
    text = 'all\nok>>>get_time\n{"tz": "UTC"}'
    deltas, parsed = _stream_all(text, "functionary_v3_2", chunk=2)
    tc = [d["tool_calls"][0] for d in deltas if "tool_calls" in d]
    assert tc and tc[0]["function"]["name"] == "get_time"
    assert parsed["tool_calls"][0]["function"]["name"] == "get_time"
