"""Paged KV-cache page allocator.

Reference parity: upstream vLLM's block manager that the reference's AR
stages inherit (SURVEY.md §2.9 row 1). Pages are fixed-size token slots in
the device KV arrays; the allocator is pure host-side Python bookkeeping —
the device only ever sees int32 page-table tensors.

Supports ref-counted pages so prefix caching (reference:
core/prefix_cache.py:14) can share full pages between requests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from vllm_omni_tpu.utils import cdiv


@dataclass
class PageAllocation:
    page_ids: list[int] = field(default_factory=list)
    num_cached_tokens: int = 0  # tokens covered by reused prefix pages


class BlockManager:
    def __init__(self, num_pages: int, page_size: int,
                 enable_prefix_caching: bool = False) -> None:
        from collections import OrderedDict

        if num_pages <= 0 or page_size <= 0:
            raise ValueError("num_pages and page_size must be positive")
        self.num_pages = num_pages
        self.page_size = page_size
        self.enable_prefix_caching = enable_prefix_caching
        # page 0 is reserved as the null page that padding slots of the
        # page table point to — keeps gathers in-bounds under static
        # shapes. Free pages keep their prefix-cache hash until actually
        # reallocated (evict-on-reuse, vLLM semantics): the OrderedDict's
        # insertion order is the eviction order (LRU — least recently
        # freed is evicted first).
        self._free: "OrderedDict[int, None]" = OrderedDict(
            (p, None) for p in range(1, num_pages))
        self._refcount: dict[int, int] = {}
        # full-page content hash → page id (prefix cache)
        self._hash_to_page: dict[int, int] = {}
        self._page_to_hash: dict[int, int] = {}

    # -- capacity ---------------------------------------------------------
    @property
    def num_free_pages(self) -> int:
        return len(self._free)

    def can_allocate(self, num_tokens: int) -> bool:
        return cdiv(num_tokens, self.page_size) <= self.num_free_pages

    def pages_needed(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.page_size)

    # -- alloc/free -------------------------------------------------------
    def allocate(self, num_tokens: int,
                 token_ids: Optional[list[int]] = None) -> PageAllocation:
        """Allocate pages for `num_tokens`. With prefix caching on and
        `token_ids` given, full pages whose content hash is cached are
        shared (ref-counted) instead of newly allocated."""
        need = self.pages_needed(num_tokens)
        alloc = PageAllocation()
        if (self.enable_prefix_caching and token_ids is not None):
            h = 0
            full_pages = len(token_ids) // self.page_size
            for p in range(full_pages):
                chunk = tuple(token_ids[p * self.page_size:(p + 1) *
                                        self.page_size])
                h = hash((h, chunk))
                page = self._hash_to_page.get(h)
                if page is None:
                    break
                if page in self._free:  # revive a cached-but-free page
                    del self._free[page]
                    self._refcount[page] = 1
                else:
                    self._refcount[page] += 1
                alloc.page_ids.append(page)
                alloc.num_cached_tokens += self.page_size
        remaining = need - len(alloc.page_ids)
        if remaining > self.num_free_pages:
            # roll back shared refs
            for p in alloc.page_ids:
                self._unref(p)
            raise MemoryError(
                f"need {remaining} pages, have {self.num_free_pages}")
        for _ in range(remaining):
            alloc.page_ids.append(self._take_free())
        return alloc

    def _take_free(self) -> int:
        """Pop the eviction-order head of the free list, dropping its
        stale prefix-cache entry (evict-on-reuse)."""
        page, _ = self._free.popitem(last=False)
        h = self._page_to_hash.pop(page, None)
        if h is not None:
            self._hash_to_page.pop(h, None)
        self._refcount[page] = 1
        return page

    def extend(self, page_ids: list[int], old_tokens: int,
               new_tokens: int) -> list[int]:
        """Grow a request's page list from old_tokens to new_tokens,
        returning newly added pages."""
        need = self.pages_needed(new_tokens) - len(page_ids)
        if need <= 0:
            return []
        if need > self.num_free_pages:
            raise MemoryError("out of KV pages")
        added = [self._take_free() for _ in range(need)]
        page_ids.extend(added)
        return added

    def free(self, page_ids: list[int]) -> None:
        for p in page_ids:
            self._unref(p)

    def _unref(self, page: int) -> None:
        rc = self._refcount.get(page, 0)
        if rc <= 0:
            raise ValueError(f"double free of page {page}")
        rc -= 1
        if rc == 0:
            del self._refcount[page]
            # hash entries survive the free — reuse evicts them lazily
            self._free[page] = None
        else:
            self._refcount[page] = rc

    # -- prefix cache registration -----------------------------------------
    def register_prefix(self, page_ids: list[int],
                        token_ids: list[int]) -> None:
        """After a prefill completes, publish its full pages into the
        prefix cache so later requests can share them."""
        if not self.enable_prefix_caching:
            return
        h = 0
        full_pages = len(token_ids) // self.page_size
        for p in range(min(full_pages, len(page_ids))):
            chunk = tuple(token_ids[p * self.page_size:(p + 1) *
                                    self.page_size])
            h = hash((h, chunk))
            if h not in self._hash_to_page:
                self._hash_to_page[h] = page_ids[p]
                self._page_to_hash[page_ids[p]] = h
