"""Host-side paged KV-cache block management.

Re-implements the fork's recovered paged-KV API (reference
tests/test_block_manager.cpp, tests/test_kv_cache.cpp,
tests/test_block_kv_cache.cpp — see SURVEY.md §2.9) as the control plane of a
vLLM-style paged cache: physical block pool with free list + LRU eviction,
per-sequence block tables, copy-on-write forking (the copyBlocks primitive),
and host swap (the swapBlocks primitive, reference
tests/test_block_kv_cache.cpp:20-118). The data plane (the actual KV pools)
lives on device (runtime/kv_cache.py); this module only manipulates int32
tables that are fed to the device kernels.

Eviction safety: allocation never fails (the fork's eviction-never-fails
contract), but evicting a block that a live SequenceBlockTable still maps is
only allowed when a swap store is attached — the block's data moves to host
and the owner tables mark it swapped; the next use swaps it back in
(ensure_resident). Without a swap store, evicting an owned block raises
instead of silently corrupting the victim sequence.
"""
from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Any, Callable


class HostSwapStore:
    """Host-memory backing store for swapped-out blocks (swapBlocks analogue).

    swap_out_fn(blk) -> host payload (device -> host copy of one block
    across all layer pools); swap_in_fn(payload, blk) writes it back.
    The engine provides both (Context._read_block/_write_block).
    """

    def __init__(self, swap_out_fn: Callable[[int], Any],
                 swap_in_fn: Callable[[Any, int], None]):
        self._out = swap_out_fn
        self._in = swap_in_fn
        self._data: dict[int, Any] = {}
        self._refs: dict[int, int] = {}
        self._next = 0
        self.n_swapped_out = 0
        self.n_swapped_in = 0

    def swap_out(self, blk: int, n_owners: int = 1) -> int:
        sid = self._next
        self._next += 1
        self._data[sid] = self._out(blk)
        self._refs[sid] = n_owners
        self.n_swapped_out += 1
        return sid

    def swap_in(self, sid: int, blk: int) -> None:
        """Restore payload sid into physical block blk. A payload shared by
        several owner tables (evicted while COW-shared) stays until every
        owner has swapped in its own copy."""
        self._in(self._data[sid], blk)
        self.n_swapped_in += 1
        self._unref(sid)

    def drop(self, sid: int) -> None:
        self._unref(sid)

    def _unref(self, sid: int) -> None:
        if sid in self._refs:
            self._refs[sid] -= 1
            if self._refs[sid] <= 0:
                self._refs.pop(sid)
                self._data.pop(sid, None)


class BlockManager:
    """Fixed pool of physical KV blocks with allocate/free/evict.

    Mirrors BlockManager from the reference fork (test_block_manager.cpp:8-61):
    allocation never fails — when the pool is exhausted the least-recently
    allocated unpinned block is evicted (swapped to host when owned by live
    sequences). Double-free is a safe no-op. Extended with reference counting
    so multiple sequences can share a block (prefix cache / beam forks) and
    copy-on-write can detect sharing.
    """

    def __init__(self, num_blocks: int, swap_store: HostSwapStore | None = None):
        self.num_blocks = num_blocks
        self.swap = swap_store
        self._free: list[int] = list(range(num_blocks - 1, -1, -1))
        self._refcount = [0] * num_blocks
        # LRU over allocated blocks for eviction order
        self._lru: OrderedDict[int, None] = OrderedDict()
        # live tables mapping each block (eviction notification targets)
        self._owners: dict[int, set["SequenceBlockTable"]] = {}
        self._pinned: set[int] = set()
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
        """Evict the least-recently-used unpinned block.

        Owned blocks are swapped to host (owner tables get a swap handle and
        restore on next use); unowned blocks (direct allocate_block users,
        the fork-API tests) just return to the pool."""
        victim = None
        for blk in self._lru:
            if blk not in self._pinned:
                victim = blk
                break
        if victim is None:
            from .errors import NoKvSlotError

            raise NoKvSlotError(
                "BlockManager: nothing evictable (all pinned)")
        owners = self._owners.get(victim, ())
        if owners:
            if self.swap is None:
                from .errors import NoKvSlotError

                raise NoKvSlotError(
                    f"BlockManager: block {victim} is mapped by a live "
                    f"sequence and no swap store is attached — refusing to "
                    f"corrupt it (allocate fewer/shorter sequences or enable "
                    f"swap)")
            sid = self.swap.swap_out(victim, n_owners=len(owners))
            for t in list(owners):
                t._on_evicted(victim, sid)
            self._owners.pop(victim, None)
        self._lru.pop(victim, None)
        self._refcount[victim] = 0
        self._free.append(victim)
        self.evictions += 1
        return victim

    def free_block(self, blk: int) -> None:
        """Decrement refcount; returns block to the pool at zero. Idempotent —
        freeing an already-free block is a no-op (test_block_manager.cpp:47-52)."""
        if blk < 0 or blk >= self.num_blocks or self._refcount[blk] == 0:
            return
        self._refcount[blk] -= 1
        if self._refcount[blk] == 0:
            self._lru.pop(blk, None)
            self._owners.pop(blk, None)
            self._pinned.discard(blk)
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

    # -- owner / pin bookkeeping (SequenceBlockTable hooks) -------------------

    def _add_owner(self, blk: int, table: "SequenceBlockTable") -> None:
        self._owners.setdefault(blk, set()).add(table)

    def _drop_owner(self, blk: int, table: "SequenceBlockTable") -> None:
        s = self._owners.get(blk)
        if s is not None:
            s.discard(table)
            if not s:
                self._owners.pop(blk, None)

    def pin(self, blk: int) -> None:
        self._pinned.add(blk)

    def unpin(self, blk: int) -> None:
        self._pinned.discard(blk)


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


@dataclasses.dataclass
class _Swapped:
    """Block-table entry for a block whose data lives on host."""
    swap_id: int


class SequenceBlockTable:
    """Per-sequence logical->physical block table over a shared BlockManager.

    The control half of BlockKVCache (writeToCache slot mappings, copyBlocks
    COW, swapBlocks host swap) — produces the int32 arrays the device kernels
    consume:
      block_table: [max_blocks] physical block ids (padded with 0)
      slot for position p: table[p // block_size] * block_size + p % block_size
    Entries may transiently be _Swapped handles after eviction; call
    ensure_resident() (the engine does, before building device arrays).
    """

    def __init__(self, mgr: BlockManager, block_size: int):
        self.mgr = mgr
        self.block_size = block_size
        self.blocks: list[int | _Swapped] = []
        self.n_tokens = 0
        # (src, dst) physical copies the device must perform before the next
        # step (COW resolution; drained by the engine into a copy kernel call)
        self.pending_copies: list[tuple[int, int]] = []

    def capacity(self) -> int:
        return len(self.blocks) * self.block_size

    def _acquire(self) -> int:
        blk = self.mgr.allocate_block()
        self.mgr._add_owner(blk, self)
        return blk

    def _release(self, blk) -> None:
        if isinstance(blk, _Swapped):
            if self.mgr.swap is not None:
                self.mgr.swap.drop(blk.swap_id)
            return
        # drop only THIS table's ownership; co-owners (forks) keep theirs
        self.mgr._drop_owner(blk, self)
        self.mgr.free_block(blk)

    def _on_evicted(self, blk: int, swap_id: int) -> None:
        """BlockManager callback: physical block was swapped to host."""
        for i, b in enumerate(self.blocks):
            if b == blk:
                self.blocks[i] = _Swapped(swap_id)

    def ensure_resident(self) -> bool:
        """Swap any host-resident blocks back into fresh physical blocks.
        Returns True if anything was swapped in. Pins this table's blocks for
        the duration so the swap-ins cannot evict each other."""
        if not any(isinstance(b, _Swapped) for b in self.blocks):
            return False
        for b in self.blocks:
            if not isinstance(b, _Swapped):
                self.mgr.pin(b)
        try:
            for i, b in enumerate(self.blocks):
                if not isinstance(b, _Swapped):
                    continue
                blk = self._acquire()
                self.mgr.pin(blk)
                self.mgr.swap.swap_in(b.swap_id, blk)
                self.blocks[i] = blk
        finally:
            for b in self.blocks:
                if not isinstance(b, _Swapped):
                    self.mgr.unpin(b)
        return True

    def resident_blocks(self) -> list[int]:
        """Physical ids for device arrays; requires residency."""
        self.ensure_resident()
        return self.blocks  # type: ignore[return-value]

    def append_tokens(self, n: int) -> list[int]:
        """Reserve slots for n new tokens; returns their global slot ids.
        Allocates blocks on demand; copy-on-write is handled by ensure_writable
        on the tail block."""
        self.ensure_resident()
        slots = []
        for _ in range(n):
            if self.n_tokens == self.capacity():
                self.blocks.append(self._acquire())
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
        if isinstance(blk, _Swapped):
            self.ensure_resident()
            blk = self.blocks[blk_idx]
        if self.mgr.is_shared(blk):
            new = self._acquire()
            self.pending_copies.append((blk, new))
            self.mgr._drop_owner(blk, self)
            self.mgr.free_block(blk)
            self.blocks[blk_idx] = new

    def fork(self) -> "SequenceBlockTable":
        """Share all blocks with a child sequence (seq_cp / beam fan-out)."""
        self.ensure_resident()
        child = SequenceBlockTable(self.mgr, self.block_size)
        child.blocks = list(self.blocks)
        child.n_tokens = self.n_tokens
        for b in self.blocks:
            self.mgr.fork_block(b)
            self.mgr._add_owner(b, child)
        return child

    def truncate(self, n_tokens: int) -> None:
        """Drop cached tokens beyond n_tokens (seq_rm tail analogue)."""
        need = -(-n_tokens // self.block_size) if n_tokens else 0
        while len(self.blocks) > need:
            self._release(self.blocks.pop())
        self.n_tokens = n_tokens

    def release(self) -> None:
        self.truncate(0)
