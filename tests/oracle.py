"""Golden oracle: the reference's gguf-py (numpy) codecs, imported read-only.

Used only in tests, to validate that our independently-implemented codecs
produce byte-layout-compatible output (our quantize -> oracle dequantize must
equal our dequantize). Skipped if the reference tree is absent.
"""
import importlib
import os
import sys
import types

_REF = "/root/reference/gguf-py"
_cache = {}


def load():
    if _cache:
        return _cache["quants"], _cache["constants"]
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    if "gguf" not in sys.modules or not hasattr(sys.modules.get("gguf"), "__path__"):
        pkg = types.ModuleType("gguf")
        pkg.__path__ = [os.path.join(_REF, "gguf")]
        sys.modules["gguf"] = pkg
    constants = importlib.import_module("gguf.constants")
    quants = importlib.import_module("gguf.quants")
    _cache["quants"] = quants
    _cache["constants"] = constants
    return quants, constants


def oracle_dequantize(raw, type_name: str):
    quants, constants = load()
    t = getattr(constants.GGMLQuantizationType, type_name)
    return quants.dequantize(raw, t)


def oracle_quantize(x, type_name: str):
    quants, constants = load()
    t = getattr(constants.GGMLQuantizationType, type_name)
    return quants.quantize(x, t)
