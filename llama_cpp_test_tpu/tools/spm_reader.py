"""Minimal SentencePiece .model reader (no sentencepiece dependency).

Parses just enough of the ModelProto protobuf wire format to extract the
vocabulary: repeated SentencePiece { piece=1 (string), score=2 (float),
type=3 (enum) } stored in field 1 of ModelProto. Token types map to GGUF
token_type values (NORMAL=1, UNKNOWN=2, CONTROL=3, USER_DEFINED=4, UNUSED=5,
BYTE=6) matching gguf-py's SentencePieceTokenTypes.
"""
from __future__ import annotations

import struct


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


# SentencePiece proto enum -> GGUF token type
_SPM_TYPE_TO_GGUF = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6}


def _parse_piece(buf: bytes) -> tuple[str, float, int]:
    pos = 0
    piece, score, ptype = "", 0.0, 1
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            piece = buf[pos:pos + ln].decode("utf-8", errors="replace")
            pos += ln
        elif field == 2 and wire == 5:
            (score,) = struct.unpack("<f", buf[pos:pos + 4])
            pos += 4
        elif field == 3 and wire == 0:
            ptype, pos = _read_varint(buf, pos)
        else:
            pos = _skip(buf, pos, wire)
    return piece, score, _SPM_TYPE_TO_GGUF.get(ptype, 1)


def read_spm_vocab(path: str) -> tuple[list[str], list[float], list[int]]:
    with open(path, "rb") as f:
        buf = f.read()
    tokens: list[str] = []
    scores: list[float] = []
    types: list[int] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # repeated SentencePiece pieces
            ln, pos = _read_varint(buf, pos)
            piece, score, ptype = _parse_piece(buf[pos:pos + ln])
            pos += ln
            tokens.append(piece)
            scores.append(score)
            types.append(ptype)
        else:
            pos = _skip(buf, pos, wire)
    if not tokens:
        raise ValueError(f"{path}: no sentencepiece vocab found")
    return tokens, scores, types
