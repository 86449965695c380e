"""On-hardware test suite: pins the bit-exactness / accuracy claims of
the TPU fast paths on a real chip (VERDICT round 1, next #9).

Run on a TPU host:  python -m pytest tests_tpu/ -q
(Everything here skips unless jax.default_backend() == "tpu"; the main
CPU suite lives in tests/ and forces the CPU platform, so the two
cannot share a process.)

TPU-tunnel rules honored throughout (see CLAUDE.md): scalars are
fetched as float32 reductions (never bools, never complex), float64
and c128 are never touched.
"""
import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a TPU backend")
        for item in items:
            item.add_marker(skip)
