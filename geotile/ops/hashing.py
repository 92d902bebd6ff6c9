"""Stable 64-bit string hashing shared by dedup/fingerprint stages.

Python's builtin ``hash()`` is salted per process — useless across Ray
workers. blake2b(digest_size=8) is deterministic everywhere.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np


def stable_hash64(s: str) -> int:
    return int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def stable_hash64_tokens(tokens: list[str]) -> np.ndarray:
    return np.array([stable_hash64(t) for t in tokens], dtype=np.uint64)
