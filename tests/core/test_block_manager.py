import pytest

from vllm_omni_tpu.core.block_manager import BlockManager


def test_alloc_free_roundtrip():
    bm = BlockManager(num_pages=17, page_size=16)
    assert bm.num_free_pages == 16  # page 0 reserved
    a = bm.allocate(40)  # 3 pages
    assert len(a.page_ids) == 3
    assert 0 not in a.page_ids
    assert bm.num_free_pages == 13
    bm.free(a.page_ids)
    assert bm.num_free_pages == 16


def test_extend():
    bm = BlockManager(num_pages=9, page_size=4)
    a = bm.allocate(4)
    pages = a.page_ids
    added = bm.extend(pages, 4, 5)
    assert len(added) == 1 and len(pages) == 2
    assert bm.extend(pages, 5, 8) == []  # still fits in 2 pages


def test_oom():
    bm = BlockManager(num_pages=3, page_size=4)
    bm.allocate(8)
    with pytest.raises(MemoryError):
        bm.allocate(4)


def test_double_free_detected():
    bm = BlockManager(num_pages=5, page_size=4)
    a = bm.allocate(4)
    bm.free(a.page_ids)
    with pytest.raises(ValueError):
        bm.free(a.page_ids)


def test_prefix_sharing():
    bm = BlockManager(num_pages=20, page_size=4, enable_prefix_caching=True)
    toks = list(range(12))
    a = bm.allocate(12, token_ids=toks)
    bm.register_prefix(a.page_ids, toks)
    free_before = bm.num_free_pages
    b = bm.allocate(12, token_ids=toks)
    # all 3 full pages shared, no new pages consumed
    assert b.num_cached_tokens == 12
    assert b.page_ids == a.page_ids
    assert bm.num_free_pages == free_before
    # freeing one ref keeps pages alive
    bm.free(a.page_ids)
    c = bm.allocate(12, token_ids=toks)
    assert c.num_cached_tokens == 12
    bm.free(b.page_ids)
    bm.free(c.page_ids)


def test_prefix_divergence():
    bm = BlockManager(num_pages=20, page_size=4, enable_prefix_caching=True)
    toks = list(range(8))
    a = bm.allocate(8, token_ids=toks)
    bm.register_prefix(a.page_ids, toks)
    other = list(range(4)) + [99, 98, 97, 96]
    b = bm.allocate(8, token_ids=other)
    assert b.num_cached_tokens == 4  # only first page shared
    assert b.page_ids[0] == a.page_ids[0]
    assert b.page_ids[1] != a.page_ids[1]
