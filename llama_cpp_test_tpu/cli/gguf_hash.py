"""GGUF tensor hashing tool (reference examples/gguf-hash/gguf-hash.cpp).

Prints per-tensor and whole-model digests so two GGUF files can be compared
tensor-by-tensor (e.g. after quantize/split/merge round-trips). sha256 is
always available; --uuid derives a UUIDv5 from the model digest like the
reference.

  python -m llama_cpp_test_tpu.cli.gguf_hash model.gguf
  python -m llama_cpp_test_tpu.cli.gguf_hash --uuid model.gguf
"""
from __future__ import annotations

import argparse
import hashlib
import sys
import uuid


def hash_gguf(path: str, algo: str = "sha256") -> dict[str, str]:
    """name -> hex digest, plus '<model>' for the whole-file tensor digest."""
    from ..gguf.reader import open_gguf

    out: dict[str, str] = {}
    total = hashlib.new(algo)
    with open_gguf(path) as r:
        for name in r.tensors:
            h = hashlib.new(algo)
            data = r.tensor_bytes(name).tobytes()
            h.update(data)
            total.update(data)
            out[name] = h.hexdigest()
    out["<model>"] = total.hexdigest()
    return out


# the reference uses this fixed namespace for llama.cpp model UUIDs
_UUID_NAMESPACE = uuid.UUID("ef001206-dadc-5f6d-a15f-3359e577d4e5")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("gguf-hash (tpu)")
    ap.add_argument("--sha256", action="store_true", default=True)
    ap.add_argument("--uuid", action="store_true")
    ap.add_argument("--no-per-tensor", action="store_true")
    ap.add_argument("model")
    args = ap.parse_args(argv)
    digests = hash_gguf(args.model)
    model_digest = digests.pop("<model>")
    if not args.no_per_tensor:
        for name, d in digests.items():
            print(f"sha256  {d}  {args.model}:{name}")
    print(f"sha256  {model_digest}  {args.model}")
    if args.uuid:
        print(f"UUIDv5  {uuid.uuid5(_UUID_NAMESPACE, model_digest)}  "
              f"{args.model}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
