"""Chat templating (the common/chat + llama-chat analogue).

Applies the model's embedded Jinja chat template (GGUF key
`tokenizer.chat_template`, rendered with jinja2 — the minja.hpp analogue)
or a named built-in fallback mirroring llama_chat_apply_template's builtin
table (reference src/llama-chat.cpp: ~40 handwritten formats keyed by
LLM_CHAT_TEMPLATE_*), plus the template auto-detection that the reference
does by fingerprinting the Jinja source (llm_chat_detect_template).

Also provides OpenAI-style tool-call extraction from generated text
(the common/chat.cpp format parsers): ChatML <tool_call> blocks, Mistral
[TOOL_CALLS] arrays, and bare JSON function objects.
"""
from __future__ import annotations

import json
import re
from typing import Any, Callable, Sequence


def _render_jinja(template: str, messages: Sequence[dict],
                  add_generation_prompt: bool, special: dict,
                  tools: Sequence[dict] | None = None) -> str:
    import jinja2

    env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True)

    def raise_exception(msg):
        raise jinja2.TemplateError(msg)

    def strftime_now(fmt):
        import datetime

        return datetime.datetime.now().strftime(fmt)

    kwargs = dict(
        messages=list(messages),
        add_generation_prompt=add_generation_prompt,
        raise_exception=raise_exception,
        strftime_now=strftime_now,
        **special,
    )
    if tools:
        kwargs["tools"] = list(tools)
    tmpl = env.from_string(template)
    return tmpl.render(**kwargs)


# -- builtin templates (llama-chat.cpp:llm_chat_apply_template) --------------

def _sys_fold(msgs: Sequence[dict]) -> list[dict]:
    """Fold a leading system message into the first user turn (templates
    without a system role)."""
    out: list[dict] = []
    system = ""
    for m in msgs:
        if m["role"] == "system":
            system = m["content"]
        elif m["role"] == "user" and system:
            out.append({"role": "user",
                        "content": f"{system}\n\n{m['content']}"})
            system = ""
        else:
            out.append(m)
    return out


def _chatml(msgs, gen):
    return "".join(
        f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n" for m in msgs
    ) + ("<|im_start|>assistant\n" if gen else "")


def _llama2(msgs, gen, sys_block=True):
    out = []
    system = ""
    for m in msgs:
        if m["role"] == "system":
            system = m["content"]
        elif m["role"] == "user":
            content = m["content"]
            if system:
                if sys_block:
                    content = f"<<SYS>>\n{system}\n<</SYS>>\n\n{content}"
                else:
                    content = f"{system}\n\n{content}"
                system = ""
            out.append(f"[INST] {content} [/INST]")
        else:
            out.append(m["content"])
    return "".join(out)


def _llama3(msgs, gen):
    return "<|begin_of_text|>" + "".join(
        f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
        f"{m['content']}<|eot_id|>" for m in msgs
    ) + ("<|start_header_id|>assistant<|end_header_id|>\n\n" if gen else "")


def _mistral_v3(msgs, gen):
    out = []
    for m in _sys_fold(msgs):
        if m["role"] == "user":
            out.append(f"[INST] {m['content']}[/INST]")
        else:
            out.append(f" {m['content']}</s>")
    return "".join(out)


def _mistral_v7(msgs, gen):
    out = []
    for m in msgs:
        if m["role"] == "system":
            out.append(f"[SYSTEM_PROMPT] {m['content']}[/SYSTEM_PROMPT]")
        elif m["role"] == "user":
            out.append(f"[INST] {m['content']}[/INST]")
        else:
            out.append(f" {m['content']}</s>")
    return "".join(out)


def _phi3(msgs, gen):
    return "".join(
        f"<|{m['role']}|>\n{m['content']}<|end|>\n" for m in msgs
    ) + ("<|assistant|>\n" if gen else "")


def _phi4(msgs, gen):
    return "".join(
        f"<|im_start|>{m['role']}<|im_sep|>{m['content']}<|im_end|>"
        for m in msgs
    ) + ("<|im_start|>assistant<|im_sep|>" if gen else "")


def _falcon3(msgs, gen):
    return "".join(
        f"<|{m['role']}|>\n{m['content']}\n" for m in msgs
    ) + ("<|assistant|>\n" if gen else "")


def _zephyr(msgs, gen):
    return "".join(
        f"<|{m['role']}|>\n{m['content']}<|endoftext|>\n" for m in msgs
    ) + ("<|assistant|>\n" if gen else "")


def _monarch(msgs, gen):
    out = []
    for i, m in enumerate(msgs):
        bos = "<s>" if i > 0 else ""
        out.append(f"{bos}{m['role']}\n{m['content']}</s>\n")
    if gen:
        out.append("<s>assistant\n")
    return "".join(out)


def _gemma(msgs, gen):
    out = []
    for m in _sys_fold(msgs):
        role = "model" if m["role"] == "assistant" else m["role"]
        out.append(f"<start_of_turn>{role}\n{m['content']}<end_of_turn>\n")
    if gen:
        out.append("<start_of_turn>model\n")
    return "".join(out)


def _orion(msgs, gen):
    out = []
    for m in _sys_fold(msgs):
        if m["role"] == "user":
            out.append(f"Human: {m['content']}\n\nAssistant: </s>")
        else:
            out.append(f"{m['content']}</s>")
    return "".join(out)


def _openchat(msgs, gen):
    out = []
    for m in msgs:
        if m["role"] == "system":
            out.append(f"{m['content']}<|end_of_turn|>")
        else:
            role = "GPT4 Correct " + m["role"].capitalize()
            out.append(f"{role}: {m['content']}<|end_of_turn|>")
    if gen:
        out.append("GPT4 Correct Assistant:")
    return "".join(out)


def _vicuna(msgs, gen, orca=False):
    out = []
    for m in msgs:
        if m["role"] == "system":
            out.append(f"SYSTEM: {m['content']}\n" if orca
                       else f"{m['content']}\n\n")
        elif m["role"] == "user":
            out.append(f"USER: {m['content']}\n")
        else:
            out.append(f"ASSISTANT: {m['content']}</s>\n")
    if gen:
        out.append("ASSISTANT:")
    return "".join(out)


def _deepseek(msgs, gen):
    out = []
    for m in msgs:
        if m["role"] == "system":
            out.append(f"{m['content']}\n\n")
        elif m["role"] == "user":
            out.append(f"### Instruction:\n{m['content']}\n")
        else:
            out.append(f"### Response:\n{m['content']}\n<|EOT|>\n")
    if gen:
        out.append("### Response:\n")
    return "".join(out)


def _deepseek3(msgs, gen):
    out = []
    for m in msgs:
        if m["role"] == "system":
            out.append(m["content"] + "\n\n")
        elif m["role"] == "user":
            out.append(f"<｜User｜>{m['content']}")
        else:
            out.append(f"<｜Assistant｜>{m['content']}<｜end▁of▁sentence｜>")
    if gen:
        out.append("<｜Assistant｜>")
    return "".join(out)


def _command_r(msgs, gen):
    role_map = {"system": "SYSTEM", "user": "USER", "assistant": "CHATBOT"}
    out = []
    for m in msgs:
        out.append(f"<|START_OF_TURN_TOKEN|><|{role_map[m['role']]}_TOKEN|>"
                   f"{m['content']}<|END_OF_TURN_TOKEN|>")
    if gen:
        out.append("<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>")
    return "".join(out)


def _chatglm4(msgs, gen):
    out = ["[gMASK]<sop>"]
    for m in msgs:
        out.append(f"<|{m['role']}|>\n{m['content']}")
    if gen:
        out.append("<|assistant|>")
    return "".join(out)


def _minicpm(msgs, gen):
    out = []
    for m in _sys_fold(msgs):
        if m["role"] == "user":
            out.append(f"<用户>{m['content']}<AI>")
        else:
            out.append(m["content"])
    return "".join(out)


def _exaone3(msgs, gen):
    out = []
    for m in msgs:
        if m["role"] == "system":
            out.append(f"[|system|]{m['content']}[|endofturn|]\n")
        elif m["role"] == "user":
            out.append(f"[|user|]{m['content']}\n")
        else:
            out.append(f"[|assistant|]{m['content']}[|endofturn|]\n")
    if gen:
        out.append("[|assistant|]")
    return "".join(out)


def _rwkv_world(msgs, gen):
    out = []
    for m in _sys_fold(msgs):
        role = "User" if m["role"] == "user" else "Assistant"
        out.append(f"{role}: {m['content']}\n\n")
    if gen:
        out.append("Assistant:")
    return "".join(out)


def _granite(msgs, gen):
    out = []
    for m in msgs:
        out.append(f"<|start_of_role|>{m['role']}<|end_of_role|>"
                   f"{m['content']}<|end_of_text|>\n")
    if gen:
        out.append("<|start_of_role|>assistant<|end_of_role|>\n")
    return "".join(out)


_BUILTINS: dict[str, Callable] = {
    "chatml": _chatml,
    "llama2": lambda m, g: _llama2(m, g, sys_block=True),
    "llama2-sys": lambda m, g: _llama2(m, g, sys_block=True),
    "mistral-v1": lambda m, g: _llama2(m, g, sys_block=False),
    "mistral-v3": _mistral_v3,
    "mistral-v7": _mistral_v7,
    "mistral": lambda m, g: _llama2(m, g, sys_block=True),
    "llama3": _llama3,
    "phi3": _phi3,
    "phi4": _phi4,
    "falcon3": _falcon3,
    "zephyr": _zephyr,
    "monarch": _monarch,
    "gemma": _gemma,
    "orion": _orion,
    "openchat": _openchat,
    "vicuna": lambda m, g: _vicuna(m, g, orca=False),
    "vicuna-orca": lambda m, g: _vicuna(m, g, orca=True),
    "deepseek": _deepseek,
    "deepseek3": _deepseek3,
    "command-r": _command_r,
    "chatglm4": _chatglm4,
    "minicpm": _minicpm,
    "exaone3": _exaone3,
    "rwkv-world": _rwkv_world,
    "granite": _granite,
}

# fingerprints of well-known Jinja sources -> builtin names
# (llm_chat_detect_template's substring checks, same order of specificity)
_DETECT: list[tuple[str, str]] = [
    ("<|im_sep|>", "phi4"),
    ("<|im_start|>", "chatml"),
    ("[SYSTEM_PROMPT]", "mistral-v7"),
    ("<<SYS>>", "llama2-sys"),
    ("[INST]", "mistral-v3"),
    ("<|start_header_id|>", "llama3"),
    ("<|assistant|>", "phi3"),
    ("<|user|>", "zephyr"),
    ("bos_token + message['role']", "monarch"),
    ("<start_of_turn>", "gemma"),
    ("'\\n\\nAssistant: ' + eos_token", "orion"),
    ("GPT4 Correct ", "openchat"),
    ("USER: ", "vicuna"),
    ("### Instruction:", "deepseek"),
    ("<｜User｜>", "deepseek3"),
    ("<|START_OF_TURN_TOKEN|>", "command-r"),
    ("[gMASK]<sop>", "chatglm4"),
    ("<用户>", "minicpm"),
    ("[|system|]", "exaone3"),
    ("start_of_role", "granite"),
]


def detect_template(jinja_src: str) -> str:
    for needle, name in _DETECT:
        if needle in jinja_src:
            return name
    return "chatml"


def apply_chat_template(metadata: dict, messages: Sequence[dict],
                        add_generation_prompt: bool = True,
                        template_override: str | None = None,
                        tools: Sequence[dict] | None = None) -> str:
    template = template_override or metadata.get("tokenizer.chat_template")
    if template and "{" in template:
        bos = ""
        eos = ""
        toks = metadata.get("tokenizer.ggml.tokens")
        if toks is not None:
            bos_id = metadata.get("tokenizer.ggml.bos_token_id")
            eos_id = metadata.get("tokenizer.ggml.eos_token_id")
            if bos_id is not None and int(bos_id) < len(toks):
                bos = toks[int(bos_id)]
            if eos_id is not None and int(eos_id) < len(toks):
                eos = toks[int(eos_id)]
        try:
            return _render_jinja(template, messages, add_generation_prompt,
                                 {"bos_token": bos, "eos_token": eos},
                                 tools=tools)
        except Exception:
            # fall back to the detected builtin (reference falls back to
            # llm_chat_apply_template when minja can't render)
            name = detect_template(template)
            return _BUILTINS[name](messages, add_generation_prompt)
    name = template if template in _BUILTINS else "chatml"
    return _BUILTINS[name](messages, add_generation_prompt)


# -- tool-call extraction (common/chat.cpp format parsers) -------------------

_TOOL_CALL_RE = re.compile(
    r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.DOTALL)
_MISTRAL_TC_RE = re.compile(r"\[TOOL_CALLS\]\s*(\[.*\])", re.DOTALL)


def parse_tool_calls(text: str) -> tuple[str, list[dict]]:
    """Extract tool calls from generated text. Returns (content, tool_calls)
    where tool_calls follow the OpenAI schema
    {"type": "function", "function": {"name", "arguments"}}."""
    calls: list[dict] = []

    def add(obj):
        name = obj.get("name")
        if not name:
            return False
        args = obj.get("arguments", obj.get("parameters", {}))
        if isinstance(args, str):
            arg_str = args
        else:
            arg_str = json.dumps(args)
        calls.append({"type": "function", "id": f"call_{len(calls)}",
                      "function": {"name": name, "arguments": arg_str}})
        return True

    # ChatML / Hermes style: <tool_call>{...}</tool_call>
    content = text
    found = _TOOL_CALL_RE.findall(text)
    if found:
        for blob in found:
            try:
                add(json.loads(blob))
            except json.JSONDecodeError:
                pass
        content = _TOOL_CALL_RE.sub("", text).strip()
        if calls:
            return content, calls

    # Mistral style: [TOOL_CALLS][{...}, ...]
    m = _MISTRAL_TC_RE.search(text)
    if m:
        try:
            for obj in json.loads(m.group(1)):
                add(obj)
        except json.JSONDecodeError:
            pass
        if calls:
            return text[: m.start()].strip(), calls

    # bare JSON object that looks like a function call
    stripped = text.strip()
    if stripped.startswith("{"):
        try:
            obj = json.loads(stripped)
            if isinstance(obj, dict) and add(obj):
                return "", calls
        except json.JSONDecodeError:
            pass
    return text, []
