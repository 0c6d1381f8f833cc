"""JSON-schema -> GBNF conversion tests (json-schema-to-grammar analogue)."""
import json

import pytest

from llama_cpp_test_tpu.runtime.grammar import GrammarParser
from llama_cpp_test_tpu.runtime.json_schema import JSON_GBNF, schema_to_gbnf


def accepts(gbnf: str, text: str) -> bool:
    g = GrammarParser(gbnf).parse()
    for c in text:
        if not g.accept_char(ord(c)):
            return False
    return g.is_complete()


def test_generic_json_grammar():
    for ok in ['{}', '{"a": 1}', '[1, 2, 3]', '"hi"', 'true', 'null',
               '{"x": [1.5, -2e3, {"y": null}]}']:
        assert accepts(JSON_GBNF, ok), ok
    for bad in ['{', '{"a" 1}', '[1,]', "'hi'"]:
        assert not accepts(JSON_GBNF, bad), bad


def test_object_schema():
    g = schema_to_gbnf({
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "age": {"type": "integer"}},
        "required": ["name", "age"],
    })
    assert accepts(g, '{"name": "bob", "age": 42}')
    assert not accepts(g, '{"name": "bob"}')
    assert not accepts(g, '{"age": 42, "name": "bob"}')  # fixed order


def test_enum_and_const():
    g = schema_to_gbnf({"enum": ["red", "green", 3]})
    assert accepts(g, '"red"')
    assert accepts(g, '3')
    assert not accepts(g, '"blue"')


def test_array_bounds():
    g = schema_to_gbnf({"type": "array", "items": {"type": "integer"},
                        "minItems": 1, "maxItems": 3})
    assert not accepts(g, '[]')
    assert accepts(g, '[1]')
    assert accepts(g, '[1, 2, 3]')
    assert not accepts(g, '[1, 2, 3, 4]')


def test_anyof_and_ref():
    g = schema_to_gbnf({
        "$defs": {"pt": {"type": "object",
                         "properties": {"x": {"type": "number"}},
                         "required": ["x"]}},
        "anyOf": [{"$ref": "#/$defs/pt"}, {"type": "null"}],
    })
    assert accepts(g, '{"x": 1.5}')
    assert accepts(g, 'null')
    assert not accepts(g, '{"y": 1}')


def test_nested():
    g = schema_to_gbnf({
        "type": "object",
        "properties": {
            "tags": {"type": "array", "items": {"type": "string"}},
            "active": {"type": "boolean"},
        },
        "required": ["tags", "active"],
    })
    assert accepts(g, '{"tags": ["a", "b"], "active": true}')
    assert not accepts(g, '{"tags": "a", "active": true}')
