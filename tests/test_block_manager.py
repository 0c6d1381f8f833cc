"""Block manager / paged-KV control-plane tests.

Mirrors the fork's test suite (reference tests/test_block_manager.cpp,
test_kv_cache.cpp, test_block_kv_cache.cpp — SURVEY.md §2.9): allocation
never fails (LRU eviction), double-free safety, virtual insert/free reuse,
COW copies — plus the swapBlocks host-swap path: over-committing the pool
under a LIVE batch must leave logits unchanged (eviction-safety, round-1
VERDICT weak #4).
"""
import numpy as np
import pytest

from llama_cpp_test_tpu.runtime.block_manager import (
    BlockManager, HostSwapStore, KVCacheManager, PhysicalBlock,
    SequenceBlockTable)


# -- fork-API semantics (test_block_manager.cpp:8-61) ------------------------


def test_allocate_never_fails_evicts_lru():
    mgr = BlockManager(4)
    blocks = [mgr.allocate_block() for _ in range(4)]
    assert sorted(blocks) == [0, 1, 2, 3]
    b5 = mgr.allocate_block()  # evicts the least-recently allocated
    assert b5 == blocks[0]
    assert mgr.evictions == 1


def test_double_free_is_noop():
    mgr = BlockManager(2)
    b = mgr.allocate_block()
    mgr.free_block(b)
    mgr.free_block(b)  # idempotent (test_block_manager.cpp:47-52)
    assert mgr.num_free() == 2
    assert mgr.allocate_block() == b


def test_get_block_status():
    mgr = BlockManager(3)
    a = mgr.allocate_block()
    st = mgr.get_block_status()
    assert st[a] and sum(st) == 1


def test_physical_block_slots():
    pb = PhysicalBlock(2)
    s1, s2 = pb.allocate_slot(), pb.allocate_slot()
    assert not pb.has_free_slot()
    with pytest.raises(RuntimeError):
        pb.allocate_slot()
    pb.free_slot(s1)
    assert pb.allocate_slot() == s1
    pb.free_slot(s2)
    pb.free_slot(s2)  # double free safe
    assert len(pb.get_free_slots()) == 1


def test_kv_cache_manager_insert_free_reuse():
    # freed slot is reused by the next insert (test_kv_cache.cpp:28-55)
    m = KVCacheManager(block_capacity=2)
    e1 = m.insert()
    e2 = m.insert()
    assert (e1.physical_block_index, e2.physical_block_index) == (0, 0)
    e3 = m.insert()  # grows
    assert e3.physical_block_index == 1
    m.free(e2)
    e4 = m.insert()
    assert (e4.physical_block_index, e4.slot_index) == \
        (e2.physical_block_index, e2.slot_index)


# -- eviction safety + swap ---------------------------------------------------


class FakeSwap(HostSwapStore):
    """Swap store over a dict standing in for device pools."""

    def __init__(self, pool: dict):
        super().__init__(lambda blk: pool.get(blk),
                         lambda data, blk: pool.__setitem__(blk, data))


def test_evict_owned_block_without_swap_raises():
    mgr = BlockManager(2)
    t = SequenceBlockTable(mgr, block_size=4)
    t.append_tokens(8)  # both blocks owned
    with pytest.raises(RuntimeError):
        mgr.allocate_block()


def test_swap_out_and_back_roundtrip():
    pool = {0: "A", 1: "B", 2: "C"}
    mgr = BlockManager(3, swap_store=FakeSwap(pool))
    t1 = SequenceBlockTable(mgr, block_size=4)
    t1.append_tokens(8)   # t1 owns blocks 0,1
    t2 = SequenceBlockTable(mgr, block_size=4)
    t2.append_tokens(4)   # block 2
    t2.append_tokens(4)   # pool full -> evicts t1's LRU block (0) to host
    assert mgr.evictions == 1
    assert mgr.swap.n_swapped_out == 1
    # t1's next use swaps the block back in (evicting something else)
    blocks = t1.resident_blocks()
    assert all(isinstance(b, int) for b in blocks)
    assert mgr.swap.n_swapped_in == 1
    # the restored block carries the old payload
    assert pool[blocks[0]] == "A"


def test_shared_block_eviction_both_owners_restore():
    pool = {i: f"blk{i}" for i in range(3)}
    mgr = BlockManager(3, swap_store=FakeSwap(pool))
    t1 = SequenceBlockTable(mgr, block_size=4)
    t1.append_tokens(4)          # block b0
    b0 = t1.blocks[0]
    t2 = t1.fork()               # shares b0
    filler = SequenceBlockTable(mgr, block_size=4)
    filler.append_tokens(12)     # needs 3 blocks; evicts shared b0
    assert mgr.swap.n_swapped_out == 1
    filler.release()
    r1 = t1.resident_blocks()[0]
    r2 = t2.resident_blocks()[0]
    assert r1 != r2  # each owner restored into its own copy
    assert pool[r1] == pool[r2] == f"blk{b0}"
    assert mgr.swap.n_swapped_in == 2
    assert not mgr.swap._data  # payload released after last owner


def test_overcommit_live_batch_logits_unchanged(tmp_path):
    """End-to-end eviction-safety: force pool over-commit while a live
    sequence holds blocks; its subsequent logits must equal an uncontended
    run token-for-token."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_engine import make_tiny_gguf
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(path)
    model = Model(path)
    prompt = [3, 17, 42, 5, 9, 11]

    def run(num_blocks, interleave):
        ctx = Context(model, n_ctx=64, n_seq_max=4, block_size=8,
                      num_blocks=num_blocks)
        s = ctx.new_seq()
        logits = ctx.prefill(s, prompt)
        outs = [int(np.argmax(logits))]
        other = None
        for step in range(6):
            if interleave and step == 2:
                # burn through the pool with another sequence so s's
                # blocks get evicted (swapped to host)
                other = ctx.new_seq()
                ctx.prefill(other, list(range(2, 50)))
                assert ctx.mgr.evictions > 0
                assert ctx.mgr.swap.n_swapped_out > 0
                ctx.free_seq(other)
            lg = ctx.decode([s], [outs[-1]])[0]
            outs.append(int(np.argmax(lg)))
        return outs

    baseline = run(num_blocks=64, interleave=False)
    contended = run(num_blocks=6, interleave=True)
    assert baseline == contended
