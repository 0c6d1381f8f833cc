"""Native C++ repacker vs numpy golden (bit-exact planes)."""
import numpy as np
import pytest

from llama_cpp_test_tpu.gguf.constants import GGMLType
from llama_cpp_test_tpu.quant import codecs, repack


NATIVE_TYPES = [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K,
                GGMLType.Q6_K]


@pytest.fixture(scope="module")
def lib():
    from llama_cpp_test_tpu import native

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native ggufio unavailable (no g++?)")
    return lib


@pytest.mark.parametrize("qtype", NATIVE_TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("n,k", [(256, 512), (100, 256)])
def test_native_matches_numpy(lib, qtype, n, k):
    from llama_cpp_test_tpu.native import native_repack

    rng = np.random.default_rng(0)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.3
    raw = codecs.quantize(w, qtype)

    old = repack.USE_NATIVE
    repack.USE_NATIVE = False
    try:
        golden = repack.repack(raw, qtype, n, k)
    finally:
        repack.USE_NATIVE = old
    native = native_repack(raw, int(qtype), n, k)
    assert native is not None
    assert native.kind == golden.kind
    assert native.group == golden.group
    assert native.qs.shape == golden.qs.shape
    np.testing.assert_array_equal(native.qs, golden.qs)
    np.testing.assert_allclose(native.scale, golden.scale, rtol=1e-6)
    if golden.min_ is None:
        assert native.min_ is None or not native.min_.any()
    else:
        np.testing.assert_allclose(native.min_, golden.min_, rtol=1e-6)


def test_unsupported_type_falls_back(lib):
    from llama_cpp_test_tpu.native import native_repack

    assert native_repack(b"\x00" * 64, int(GGMLType.IQ2_XXS), 1, 256) is None
