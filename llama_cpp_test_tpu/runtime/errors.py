"""Typed engine errors + abort plumbing — the recoverable-decode-error and
abort-callback analogue (reference src/llama-context.cpp:1302-1305:
llama_decode returns 1 when no KV slot is available — callers may retry
with a smaller batch — and 2 on abort via the ggml abort_callback;
include/llama.h decode return-code contract).

On TPU a dispatched step cannot be interrupted mid-flight, so the abort
callback is checked at the engine's natural yield points: before each
prefill chunk, each decode step, and each window round.
"""
from __future__ import annotations


class DecodeError(RuntimeError):
    """Base engine error. `code` mirrors llama_decode's return codes."""
    code = -1


class NoKvSlotError(DecodeError):
    """No KV cache space for the batch (recoverable: free sequences or
    retry with a smaller batch) — llama_decode == 1."""
    code = 1


class DecodeAborted(DecodeError):
    """The abort callback requested cancellation — llama_decode == 2."""
    code = 2
