"""Small shared utilities (shape math, bucketing, ids)."""

import math
import uuid
from typing import Sequence


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n. Buckets must be sorted ascending.

    Bucketed static shapes replace the reference's CUDA-graph capture
    (SURVEY.md §7 design stance): XLA compiles one program per bucket.
    """
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"n={n} exceeds largest bucket {buckets[-1]}")


def default_token_buckets(max_len: int, start: int = 16) -> list[int]:
    """Powers of two from `start` to round_up(max_len)."""
    out = []
    b = start
    while b < max_len:
        out.append(b)
        b *= 2
    out.append(round_up(max_len, 1) if b == max_len else b)
    # dedup while keeping order
    seen, res = set(), []
    for x in out:
        if x not in seen:
            seen.add(x)
            res.append(x)
    return res


def random_uuid() -> str:
    return uuid.uuid4().hex


def human_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024:
            return f"{n:.2f} {unit}"
        n /= 1024
    return f"{n:.2f} PiB"


def assert_divisible(a: int, b: int, what: str = "") -> None:
    if a % b != 0:
        raise ValueError(f"{what}: {a} not divisible by {b}")


def log2_int(x: int) -> int:
    l = int(math.log2(x))
    if (1 << l) != x:
        raise ValueError(f"{x} is not a power of two")
    return l
