"""llama-tts analogue (reference examples/tts/tts.cpp, OuteTTS flow):
a text-to-codes LLM generates audio-codebook tokens, the WavTokenizer-dec
vocoder (models/wavtokenizer.py) turns them into a 24kHz waveform.

Usage:
  python -m llama_cpp_test_tpu.cli.tts -m outetts.gguf -mv wavtok.gguf \
      -p "hello world" -o out.wav
  python -m llama_cpp_test_tpu.cli.tts -mv wavtok.gguf \
      --codes 12,44,19,... -o out.wav      # vocoder-only
"""
from __future__ import annotations

import argparse
import re
import sys
import time

import numpy as np

# OuteTTS v0.2 audio-code token offset ("<|0|>", tts.cpp:720)
CODE_TOKEN_OFFSET = 151672


def process_text(text: str) -> str:
    """tts.cpp process_text (OuteTTS v0.2 prompt_processor analogue):
    lowercase, strip to word characters, join single-spaced."""
    t = text.lower()
    t = re.sub(r"[-_/,\.\\]", " ", t)
    t = re.sub(r"[^a-z\s]", "", t)
    t = re.sub(r"\s+", " ", t).strip()
    return t


def build_prompt(text: str) -> str:
    words = process_text(text).split()
    body = "<|text_sep|>".join(words)
    return ("<|im_start|>\n<|text_start|>" + body +
            "<|text_end|>\n<|audio_start|>\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-tts (tpu)")
    ap.add_argument("-m", "--model", default=None,
                    help="OuteTTS text-to-codes GGUF")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="WavTokenizer-dec GGUF")
    ap.add_argument("-p", "--prompt", default="Hello world")
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("-n", "--n-predict", type=int, default=768)
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("--codes", default=None,
                    help="comma-separated audio codes (skip the LLM)")
    args = ap.parse_args(argv)

    from ..models.wavtokenizer import (decode_codes, embd_to_audio,
                                       load_wavtokenizer, write_wav)

    voc = load_wavtokenizer(args.model_vocoder)
    if args.codes:
        codes = np.asarray([int(c) for c in args.codes.split(",")], np.int32)
    else:
        if not args.model:
            print("error: need -m (OuteTTS model) or --codes",
                  file=sys.stderr)
            return 1
        from ..runtime.engine import Context, Model

        t0 = time.time()
        model = Model(args.model)
        print(f"# ttc model loaded in {time.time()-t0:.1f}s",
              file=sys.stderr)
        ctx = Context(model, n_ctx=args.ctx_size, n_seq_max=1)
        prompt = build_prompt(args.prompt)
        toks = model.tokenizer.encode(prompt, add_special=True)
        s = ctx.new_seq()
        logits = ctx.prefill(s, toks)
        out = []
        vocab = model.tokenizer.vocab
        for _ in range(args.n_predict):
            tok = int(np.argmax(logits))
            if vocab.is_eog(tok) or tok < CODE_TOKEN_OFFSET:
                piece = model.tokenizer.token_to_piece(tok)
                if "audio_end" in piece or vocab.is_eog(tok):
                    break
            out.append(tok)
            logits = ctx.decode([s], [tok])[0]
        codes = np.asarray(
            [t - CODE_TOKEN_OFFSET for t in out
             if t >= CODE_TOKEN_OFFSET], np.int32)
        print(f"# generated {codes.size} audio codes", file=sys.stderr)
        if codes.size == 0:
            print("error: model produced no audio codes", file=sys.stderr)
            return 1

    t0 = time.time()
    embd = decode_codes(voc, codes)
    audio = embd_to_audio(embd, n_fft=voc.n_fft)
    write_wav(args.output, audio)
    print(f"# {audio.size} samples ({audio.size/24000:.2f}s) -> "
          f"{args.output} in {time.time()-t0:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
