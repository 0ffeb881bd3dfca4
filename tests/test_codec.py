"""Native codec tests: LZ4 block-format round trips + compression ratio."""

import numpy as np
import pytest

from iris_lama_tpu.utils.codec import BufferCompressor

rng = np.random.default_rng(33)


def test_native_builds():
    bc = BufferCompressor("lz4")
    assert bc.is_native, "native codec failed to build (g++ required)"


def test_roundtrip_patterns():
    bc = BufferCompressor("lz4")
    cases = [
        b"",
        b"a",
        b"hello world " * 100,
        bytes(range(256)) * 10,
        np.zeros(4096, np.uint8).tobytes(),
        rng.integers(0, 256, 5000).astype(np.uint8).tobytes(),
        (np.arange(1024, dtype=np.uint16) % 7).tobytes(),
    ]
    for data in cases:
        comp = bc.compress(data)
        back = bc.decompress(comp, len(data))
        assert back == data, f"roundtrip failed for len={len(data)}"


def test_compresses_sparse_patches():
    # a typical occupancy patch: mostly zeros
    bc = BufferCompressor("lz4")
    patch = np.zeros((32, 32), np.uint16)
    patch[10:12, :] = 7
    data = patch.tobytes()
    comp = bc.compress(data)
    assert len(comp) < len(data) // 4
    assert bc.decompress(comp, len(data)) == data


def test_incompressible_within_bound():
    bc = BufferCompressor("lz4")
    data = rng.integers(0, 256, 10000).astype(np.uint8).tobytes()
    comp = bc.compress(data)
    assert len(comp) <= bc.compress_bound(len(data))
    assert bc.decompress(comp, len(data)) == data


def test_lz4_frame_parses_own_output():
    # block format invariants: final sequence literal-only
    bc = BufferCompressor("lz4")
    data = b"abcdabcdabcdabcdXYZ"
    comp = bc.compress(data)
    assert bc.decompress(comp, len(data)) == data
