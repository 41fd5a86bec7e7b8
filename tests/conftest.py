"""Test env: force CPU with 8 virtual devices BEFORE jax initialises.

This is the idiomatic JAX substitute for a fake distributed backend
(SURVEY.md §4): multi-chip sharding logic runs on a host-platform mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep HF fully offline in tests.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS during discovery; the config
# value set after import wins as long as no backend has initialised yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from protein_clip_tpu.utils.hostlock import multidevice_lock  # noqa: E402

# One multi-device XLA:CPU job per host (see utils/hostlock.py): the whole
# pytest session holds the lock, and exports PCT_HOSTLOCK_HELD so subprocess
# tests (CLI entries, the graft-entry dryrun child) inherit it instead of
# deadlocking. A concurrent manual dryrun now waits instead of crashing both
# processes on collective-rendezvous starvation.
_session_lock = multidevice_lock(label="pytest session")
_session_lock.__enter__()


def pytest_sessionfinish(session, exitstatus):
    global _session_lock
    if _session_lock is not None:
        _session_lock.__exit__(None, None, None)
        _session_lock = None


def pytest_collection_modifyitems(config, items):
    """Everything not marked slow is the smoke tier (`pytest -m smoke`)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
