"""Sampler chain unit tests (the test-sampling.cpp analogue)."""
import numpy as np
import pytest

from llama_cpp_test_tpu.runtime.sampling import (
    DRY, Dist, Greedy, LogitBias, MinP, MirostatV1, MirostatV2, Penalties,
    SamplerChain, SamplerParams, SampleState, Temperature, TopK, TopNSigma,
    TopP, Typical, XTC,
)


def make_state(probs):
    probs = np.asarray(probs, np.float64)
    logits = np.log(probs / probs.max())
    return SampleState.from_logits(logits.astype(np.float32))


def apply_all(st, *samplers):
    for s in samplers:
        s.apply(st)
    st.softmax()
    return st


def test_top_k():
    st = make_state([0.4, 0.3, 0.2, 0.1])
    apply_all(st, TopK(2))
    assert list(st.ids) == [0, 1]
    np.testing.assert_allclose(st.probs, [4 / 7, 3 / 7], atol=1e-5)


def test_top_p():
    st = make_state([0.4, 0.3, 0.2, 0.1])
    apply_all(st, TopP(0.7))
    assert list(st.ids) == [0, 1]


def test_top_p_keeps_all_when_1():
    st = make_state([0.4, 0.3, 0.2, 0.1])
    apply_all(st, TopP(1.0))
    assert len(st.ids) == 4


def test_min_p():
    st = make_state([0.5, 0.3, 0.1, 0.05, 0.05])
    apply_all(st, MinP(0.4))  # threshold 0.4 * p_max
    # p >= 0.4*0.5=0.2 of renormalized? reference: relative to max prob
    assert list(st.ids) == [0, 1]


def test_typical():
    st = make_state([0.97, 0.01, 0.01, 0.01])
    apply_all(st, Typical(0.5))
    assert list(st.ids) == [0]


def test_temperature_greedy_when_zero():
    st = make_state([0.3, 0.4, 0.3])
    apply_all(st, Temperature(0.0))
    assert int(st.ids[np.argmax(st.logits)]) == 1


def test_xtc_removes_top():
    st = make_state([0.5, 0.3, 0.1, 0.1])
    x = XTC(p=1.0, threshold=0.25, seed=1)
    x.apply(st)
    st.softmax()
    assert list(st.ids) == [1, 2, 3]  # both >=0.25; all but last removed


def test_top_n_sigma():
    st = make_state([0.5, 0.3, 0.15, 0.05])
    apply_all(st, TopNSigma(1.0))
    assert 1 <= len(st.ids) < 4


def test_penalties_repeat():
    st = SampleState.from_logits(np.array([2.0, 1.9, 0.1], np.float32))
    p = Penalties(n_last=8, repeat=2.0)
    p.accept(0)
    p.apply(st)
    st.softmax()
    assert st.ids[0] != 0  # token 0 penalized below token 1 (2.0/2 < 1.9)


def test_logit_bias():
    st = make_state([0.4, 0.3, 0.3])
    LogitBias({2: 10.0}).apply(st)
    st.softmax()
    assert int(st.ids[0]) == 2


def test_dry_penalizes_repetition():
    st = make_state(np.full(16, 1.0 / 16))
    d = DRY(multiplier=2.0, allowed_length=2)
    for t in [1, 2, 3, 7, 7, 1, 2]:  # suffix [1,2] matched earlier -> 3 penalized
        d.accept(t)
    before = st.logits.copy()
    d.apply(st)
    assert st.logits[3] < before[3] - 0.5
    assert st.logits[4] == before[4]


def test_dist_deterministic_seed():
    st1 = make_state([0.25, 0.25, 0.25, 0.25])
    st2 = make_state([0.25, 0.25, 0.25, 0.25])
    Dist(seed=42).apply(st1)
    Dist(seed=42).apply(st2)
    assert list(st1.ids) == list(st2.ids)


def test_mirostat_v2_runs():
    rng = np.random.default_rng(0)
    m = MirostatV2(tau=5.0, eta=0.1, seed=3)
    for _ in range(10):
        st = make_state(rng.dirichlet(np.ones(50)))
        m.apply(st)
        assert len(st.ids) == 1


def test_mirostat_v1_runs():
    rng = np.random.default_rng(0)
    m = MirostatV1(tau=5.0, eta=0.1, n_vocab=50, seed=3)
    for _ in range(10):
        st = make_state(rng.dirichlet(np.ones(50)))
        m.apply(st)
        assert len(st.ids) == 1


def test_chain_greedy():
    chain = SamplerChain.from_params(SamplerParams(temp=0.0))
    logits = np.array([0.1, 5.0, 0.2], np.float32)
    assert chain.sample(logits) == 1


def test_chain_default_sampling_reproducible():
    p = SamplerParams(seed=7)
    c1 = SamplerChain.from_params(p)
    c2 = SamplerChain.from_params(p)
    rng = np.random.default_rng(1)
    logits = rng.standard_normal(100).astype(np.float32) * 3
    toks1 = [c1.sample(logits) for _ in range(5)]
    toks2 = [c2.sample(logits) for _ in range(5)]
    assert toks1 == toks2


def test_chain_penalty_integration():
    p = SamplerParams(temp=0.0, penalty_repeat=1.5, penalty_last_n=16)
    chain = SamplerChain.from_params(p)
    logits = np.array([2.0, 1.9, 0.0], np.float32)
    t1 = chain.sample(logits)
    assert t1 == 0
    chain.accept(t1)
    t2 = chain.sample(logits)
    assert t2 == 1  # 0 penalized: 2.0/1.5 < 1.9


def test_infill_sampler_eog_mass_and_prefix_merge():
    """runtime.sampling.Infill mirrors llama_sampler_init_infill: EOG-mass
    shortcut, common-prefix merging, thresholds."""
    import numpy as np
    from llama_cpp_test_tpu.runtime.sampling import Infill, SampleState

    class FakeVocab:
        eos_id = 0

        def is_eog(self, t):
            return t == 0

    class FakeTok:
        vocab = FakeVocab()
        pieces = {0: "", 1: "he", 2: "hello", 3: "xyz"}

        def token_to_piece(self, t, special=False):
            return self.pieces.get(t, "")

    smp = Infill(FakeTok())

    # EOG dominates -> only EOG kept
    st = SampleState(logits=np.asarray([5.0, 0.0, 0.0, 0.0], np.float32),
                     ids=np.asarray([0, 1, 2, 3], np.int32))
    smp.apply(st)
    assert list(st.ids) == [0]

    # 'he' is a prefix of 'hello': mass merges into the stronger one and
    # the weaker candidate disappears
    st = SampleState(
        logits=np.asarray([-9.0, 2.0, 2.5, 2.4], np.float32),
        ids=np.asarray([0, 1, 2, 3], np.int32))
    smp.apply(st)
    assert 1 not in list(st.ids)
    assert 2 in list(st.ids)
