"""Test configuration: run on CPU with 8 virtual devices so distributed
(sharded) code paths are exercised without TPU hardware, mirroring the
reference's serial-vs-MPI driver-pair strategy (SURVEY.md §4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers an experimental "axon" TPU-tunnel
# backend that overrides JAX_PLATFORMS; force platform selection through the
# config API (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running e2e DMFT loops")


import pytest


@pytest.fixture(autouse=True)
def _isolate_cwd(tmp_path, monkeypatch):
    """Solver routines write reference-format .ed files into the cwd
    (by design, matching the reference's file contracts) — keep test runs
    out of the repo tree."""
    monkeypatch.chdir(tmp_path)
