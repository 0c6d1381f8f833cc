"""Host-side paged KV-cache block management.

Re-implements the fork's recovered paged-KV API (reference
tests/test_block_manager.cpp, tests/test_kv_cache.cpp,
tests/test_block_kv_cache.cpp — see SURVEY.md §2.9) as the control plane of a
vLLM-style paged cache: physical block pool with free list + LRU eviction,
per-sequence block tables, copy-on-write forking (the copyBlocks primitive),
and swap bookkeeping (swapBlocks). The data plane (the actual KV pools) lives
on device (runtime/kv_cache.py); this module only manipulates int32 tables
that are fed to the device kernels.
"""
from __future__ import annotations

import dataclasses
from collections import OrderedDict


class BlockManager:
    """Fixed pool of physical KV blocks with allocate/free/evict.

    Mirrors BlockManager from the reference fork (test_block_manager.cpp:8-61):
    allocation never fails — when the pool is exhausted the least-recently
    allocated unpinned block is evicted. Double-free is a safe no-op.
    Extended with reference counting so multiple sequences can share a block
    (prefix cache / beam forks) and copy-on-write can detect sharing.
    """

    def __init__(self, num_blocks: int):
        self.num_blocks = num_blocks
        self._free: list[int] = list(range(num_blocks - 1, -1, -1))
        self._refcount = [0] * num_blocks
        # LRU over allocated blocks for eviction order
        self._lru: OrderedDict[int, None] = OrderedDict()
        self.evictions = 0

    def num_free(self) -> int:
        return len(self._free)

    def allocate_block(self) -> int:
        """Allocate one block; evicts the LRU block when full (never fails)."""
        if not self._free:
            self.evict_block()
        blk = self._free.pop()
        self._refcount[blk] = 1
        self._lru[blk] = None
        self._lru.move_to_end(blk)
        return blk

    def evict_block(self) -> int:
        """Evict least-recently-allocated block, returning it to the free list."""
        if not self._lru:
            raise RuntimeError("BlockManager: nothing to evict")
        blk, _ = self._lru.popitem(last=False)
        self._refcount[blk] = 0
        self._free.append(blk)
        self.evictions += 1
        return blk

    def free_block(self, blk: int) -> None:
        """Decrement refcount; returns block to the pool at zero. Idempotent —
        freeing an already-free block is a no-op (test_block_manager.cpp:47-52)."""
        if blk < 0 or blk >= self.num_blocks or self._refcount[blk] == 0:
            return
        self._refcount[blk] -= 1
        if self._refcount[blk] == 0:
            self._lru.pop(blk, None)
            self._free.append(blk)

    def fork_block(self, blk: int) -> None:
        """Add a reference (sequence fork / shared prefix)."""
        if self._refcount[blk] == 0:
            raise ValueError(f"fork of free block {blk}")
        self._refcount[blk] += 1

    def refcount(self, blk: int) -> int:
        return self._refcount[blk]

    def is_shared(self, blk: int) -> bool:
        return self._refcount[blk] > 1

    def touch(self, blk: int) -> None:
        if blk in self._lru:
            self._lru.move_to_end(blk)

    def get_block_status(self) -> list[bool]:
        """True = allocated (the getBlockStatus analogue)."""
        return [rc > 0 for rc in self._refcount]


@dataclasses.dataclass
class VirtualBlockEntry:
    """Virtual->physical mapping entry (KVCacheManager::insert analogue)."""
    physical_block_index: int
    slot_index: int


class PhysicalBlock:
    """Slot pool inside one block (PhysicalBlock from test_apply_attention)."""

    def __init__(self, capacity: int):
        self._capacity = capacity
        self._free: list[int] = list(range(capacity - 1, -1, -1))

    def get_capacity(self) -> int:
        return self._capacity

    def has_free_slot(self) -> bool:
        return bool(self._free)

    def get_free_slots(self) -> list[int]:
        return sorted(self._free)

    def allocate_slot(self) -> int:
        if not self._free:
            raise RuntimeError("No free slot available in PhysicalBlock")
        return self._free.pop()

    def free_slot(self, slot: int) -> None:
        if 0 <= slot < self._capacity and slot not in self._free:
            self._free.append(slot)


class KVCacheManager:
    """Growable virtual->physical slot allocator (KVCacheManager analogue).

    insert() finds (or creates) a physical block with a free slot and returns
    a VirtualBlockEntry; free() releases the slot for reuse.
    """

    def __init__(self, block_capacity: int):
        self.block_capacity = block_capacity
        self.blocks: list[PhysicalBlock] = []

    def ensure_free_slot(self) -> None:
        if not any(b.has_free_slot() for b in self.blocks):
            self.blocks.append(PhysicalBlock(self.block_capacity))

    def total_free_slots(self) -> int:
        return sum(len(b.get_free_slots()) for b in self.blocks)

    def insert(self) -> VirtualBlockEntry:
        self.ensure_free_slot()
        for i, b in enumerate(self.blocks):
            if b.has_free_slot():
                return VirtualBlockEntry(i, b.allocate_slot())
        raise RuntimeError(
            "Insert failed: No free slot available after ensuring free slot.")

    def free(self, entry: VirtualBlockEntry) -> None:
        self.blocks[entry.physical_block_index].free_slot(entry.slot_index)


class SequenceBlockTable:
    """Per-sequence logical->physical block table over a shared BlockManager.

    The control half of BlockKVCache (writeToCache slot mappings, copyBlocks
    COW, swapBlocks) — produces the int32 arrays the device kernels consume:
      block_table: [max_blocks] physical block ids (padded with 0)
      slot for position p: table[p // block_size] * block_size + p % block_size
    """

    def __init__(self, mgr: BlockManager, block_size: int):
        self.mgr = mgr
        self.block_size = block_size
        self.blocks: list[int] = []
        self.n_tokens = 0
        # (src, dst) physical copies the device must perform before the next
        # step (COW resolution; drained by the engine into a copy kernel call)
        self.pending_copies: list[tuple[int, int]] = []

    def capacity(self) -> int:
        return len(self.blocks) * self.block_size

    def append_tokens(self, n: int) -> list[int]:
        """Reserve slots for n new tokens; returns their global slot ids.
        Allocates blocks on demand; copy-on-write is handled by ensure_writable
        on the tail block."""
        slots = []
        for _ in range(n):
            if self.n_tokens == self.capacity():
                self.blocks.append(self.mgr.allocate_block())
            blk_idx = self.n_tokens // self.block_size
            self._ensure_writable(blk_idx)
            blk = self.blocks[blk_idx]
            self.mgr.touch(blk)
            slots.append(blk * self.block_size + self.n_tokens % self.block_size)
            self.n_tokens += 1
        return slots

    def _ensure_writable(self, blk_idx: int):
        """COW: writing into a shared block first copies it (copyBlocks)."""
        blk = self.blocks[blk_idx]
        if self.mgr.is_shared(blk):
            new = self.mgr.allocate_block()
            self.pending_copies.append((blk, new))
            self.mgr.free_block(blk)
            self.blocks[blk_idx] = new

    def fork(self) -> "SequenceBlockTable":
        """Share all blocks with a child sequence (seq_cp / beam fan-out)."""
        child = SequenceBlockTable(self.mgr, self.block_size)
        child.blocks = list(self.blocks)
        child.n_tokens = self.n_tokens
        for b in self.blocks:
            self.mgr.fork_block(b)
        return child

    def truncate(self, n_tokens: int) -> None:
        """Drop cached tokens beyond n_tokens (seq_rm tail analogue)."""
        need = -(-n_tokens // self.block_size) if n_tokens else 0
        while len(self.blocks) > need:
            self.mgr.free_block(self.blocks.pop())
        self.n_tokens = n_tokens

    def release(self) -> None:
        self.truncate(0)


