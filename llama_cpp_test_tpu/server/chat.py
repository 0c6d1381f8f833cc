"""Chat templating (the common/chat + llama-chat analogue).

Applies the model's embedded Jinja chat template (GGUF key
`tokenizer.chat_template`, rendered with jinja2 — the minja.hpp analogue)
or a named built-in fallback (llama2 / llama3 / chatml / mistral ...,
mirroring llama_chat_apply_template's built-ins, reference src/llama-chat.cpp).
"""
from __future__ import annotations

from typing import Any, Sequence


def _render_jinja(template: str, messages: Sequence[dict],
                  add_generation_prompt: bool, special: dict) -> str:
    import jinja2

    env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True)

    def raise_exception(msg):
        raise jinja2.TemplateError(msg)

    tmpl = env.from_string(template)
    return tmpl.render(
        messages=list(messages),
        add_generation_prompt=add_generation_prompt,
        raise_exception=raise_exception,
        **special,
    )


_BUILTINS = {
    "chatml": lambda msgs, gen: "".join(
        f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n" for m in msgs
    ) + ("<|im_start|>assistant\n" if gen else ""),
    "llama3": lambda msgs, gen: "<|begin_of_text|>" + "".join(
        f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n{m['content']}<|eot_id|>"
        for m in msgs
    ) + ("<|start_header_id|>assistant<|end_header_id|>\n\n" if gen else ""),
}


def _llama2(msgs: Sequence[dict], gen: bool) -> str:
    out = []
    system = ""
    for m in msgs:
        if m["role"] == "system":
            system = m["content"]
        elif m["role"] == "user":
            content = m["content"]
            if system:
                content = f"<<SYS>>\n{system}\n<</SYS>>\n\n{content}"
                system = ""
            out.append(f"[INST] {content} [/INST]")
        else:
            out.append(m["content"])
    return "".join(out)


_BUILTINS["llama2"] = _llama2
_BUILTINS["mistral"] = _llama2


def apply_chat_template(metadata: dict, messages: Sequence[dict],
                        add_generation_prompt: bool = True,
                        template_override: str | None = None) -> str:
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
                                 {"bos_token": bos, "eos_token": eos})
        except Exception:
            pass  # fall through to builtins
    name = template if template in _BUILTINS else "chatml"
    return _BUILTINS[name](messages, add_generation_prompt)
