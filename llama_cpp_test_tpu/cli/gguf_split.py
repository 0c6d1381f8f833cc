"""GGUF shard/merge tool (reference examples/gguf-split/gguf-split.cpp).

  split: python -m ...cli.gguf_split --split-max-tensors 128 in.gguf out
         python -m ...cli.gguf_split --split-max-size 4G in.gguf out
  merge: python -m ...cli.gguf_split --merge in-00001-of-00003.gguf out.gguf

Shard naming follows llama_split_path (include/llama.h:1367):
  <prefix>-%05d-of-%05d.gguf
The first shard carries the full KV metadata plus split.* bookkeeping keys;
every shard holds a subset of tensors. The engine loads split models
transparently via gguf.reader.open_gguf.
"""
from __future__ import annotations

import argparse
import re
import sys

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader, split_path, SPLIT_RE
from ..gguf.writer import GGUFWriter

KEY_SPLIT_NO = "split.no"
KEY_SPLIT_COUNT = "split.count"
KEY_SPLIT_TENSORS = "split.tensors.count"


def _parse_size(s: str) -> int:
    m = re.fullmatch(r"(\d+)([MG]?)", s)
    if not m:
        raise ValueError(f"bad size {s!r} (use e.g. 500M, 4G)")
    n = int(m.group(1))
    return n * {"": 1, "M": 1 << 20, "G": 1 << 30}[m.group(2)]


def split(in_path: str, out_prefix: str, max_tensors: int = 0,
          max_size: int = 0) -> list[str]:
    r = GGUFReader(in_path)
    names = list(r.tensors)
    groups: list[list[str]] = [[]]
    acc = 0
    for name in names:
        nbytes = r.tensors[name].nbytes
        cur = groups[-1]
        over_t = max_tensors and len(cur) >= max_tensors
        over_s = max_size and cur and acc + nbytes > max_size
        if over_t or over_s:
            groups.append([])
            acc = 0
        groups[-1].append(name)
        acc += nbytes
    n_split = len(groups)
    paths = []
    for i, group in enumerate(groups):
        path = split_path(out_prefix, i + 1, n_split)
        w = GGUFWriter(path)
        if i == 0:
            for k, v in r.metadata.items():
                w.add_kv(k, v)
        w.add_kv(KEY_SPLIT_NO, i)
        w.add_kv(KEY_SPLIT_COUNT, n_split)
        w.add_kv(KEY_SPLIT_TENSORS, len(names))
        for name in group:
            info = r.tensors[name]
            w.add_tensor(name, r.tensor_bytes(name),
                         ggml_type=info.ggml_type, raw_ggml_shape=info.shape)
        w.write()
        paths.append(path)
        print(f"wrote {path} ({len(group)} tensors)")
    r.close()
    return paths


def merge(first_split: str, out_path: str) -> None:
    m = SPLIT_RE.search(first_split)
    if not m:
        raise ValueError("input must be the first *-00001-of-NNNNN.gguf file")
    prefix = first_split[: m.start()]
    n_split = int(m.group(2))
    w = GGUFWriter(out_path)
    for i in range(n_split):
        path = split_path(prefix, i + 1, n_split)
        r = GGUFReader(path)
        if i == 0:
            for k, v in r.metadata.items():
                if not k.startswith("split."):
                    w.add_kv(k, v)
        for name, info in r.tensors.items():
            w.add_tensor(name, r.tensor_bytes(name),
                         ggml_type=info.ggml_type, raw_ggml_shape=info.shape)
        r.close()
    w.write()
    print(f"merged {n_split} shards -> {out_path}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("gguf-split (tpu)")
    ap.add_argument("--split-max-tensors", type=int, default=0)
    ap.add_argument("--split-max-size", default=None, help="e.g. 500M, 4G")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args(argv)
    if args.merge:
        merge(args.input, args.output)
    else:
        max_size = _parse_size(args.split_max_size) \
            if args.split_max_size else 0
        if not max_size and not args.split_max_tensors:
            args.split_max_tensors = 128
        split(args.input, args.output, args.split_max_tensors, max_size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
