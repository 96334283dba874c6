"""Test harness config: force the JAX CPU backend with a virtual 8-device
mesh so sharding tests run hermetically without TPU hardware (SURVEY.md §4,
"TPU equivalent of multi-node without a real cluster")."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pytest

# Persistent compile cache: the suite compiles many (shape-bucket, op)
# variants; cache them across runs to keep iteration fast.
import jax

# The axon site hook pins JAX_PLATFORMS at interpreter startup; the config
# update below takes precedence and keeps tests hermetic on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qoipp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

FIXTURES = Path(__file__).resolve().parent / "fixtures"


def load_fixture(name: str) -> np.ndarray:
    return np.frombuffer((FIXTURES / name).read_bytes(), dtype=np.uint8)


@pytest.fixture
def raw3():
    return load_fixture("image_raw_3.bin")


@pytest.fixture
def raw4():
    return load_fixture("image_raw_4.bin")


@pytest.fixture
def qoi3():
    return load_fixture("image_qoi_3.bin")


@pytest.fixture
def qoi4():
    return load_fixture("image_qoi_4.bin")


@pytest.fixture
def qoi3_incomplete():
    return load_fixture("image_qoi_3_incomplete.bin")


@pytest.fixture
def qoi4_incomplete():
    return load_fixture("image_qoi_4_incomplete.bin")
