"""Test configuration: run JAX on CPU with 8 virtual devices so pjit/shard_map
sharding tests work without TPU hardware (standard JAX practice; see
SURVEY.md §4). Forced via jax.config before any backend initialisation —
env vars alone lose to the session's JAX_PLATFORMS=axon."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: most of the 30-minute suite wall is XLA
# compiles repeated identically every run; cached executables key on the
# HLO hash so correctness is unaffected. OWC_NO_COMPILE_CACHE=1 opts out.
from openai_whisper_compression_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache(
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_tests"),
    min_secs=0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
