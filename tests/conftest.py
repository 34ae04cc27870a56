"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=8).

Must set env before jax initializes a backend — keep this file first-import.
"""
import os

# Force the CPU backend: the axon TPU plugin registers itself at interpreter
# boot (see /root/.axon_site/sitecustomize.py, which imports jax), so env vars
# are too late — override the config directly before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is compile-dominated (VERDICT r1
# item 9) — repeat runs hit the on-disk cache instead of re-lowering
from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache(os.path.expanduser("~/.cache/pbrt_tpu_jax_tests"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
