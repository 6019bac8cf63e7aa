"""Persistent XLA compilation cache (round-5 cold-start fix).

Every fresh process used to re-pay minutes of XLA compiles through the
axon tunnel before its first DMFT iteration (PERF_NOTES round-4 e2e
table: iteration 1 at 10-40x the steady state). Measured round 5
(probe_cache.py): the axon PJRT client *does* serialize executables, so
jax's persistent compilation cache turns a cold process's compiles into
~30 ms disk hits. This module enables the cache process-wide at package
import, keyed off a stable per-user directory.

Controls:
  DMFT_ED_COMPILE_CACHE=<dir>  cache directory (default
                               ~/.cache/dmft_ed_tpu/xla)
  DMFT_ED_COMPILE_CACHE=0|off  disable
An explicitly configured jax_compilation_cache_dir (user code or
JAX_COMPILATION_CACHE_DIR env) is left untouched.

No reference equivalent — the reference's Fortran is compiled ahead of
time; this is the TPU-native answer to the same "restart a DMFT loop
without re-paying setup" contract its .restart files serve (SURVEY §5).
"""

from __future__ import annotations

import os

import jax


def enable() -> str | None:
    """Enable the persistent compilation cache; returns the directory in
    use, or None when disabled/already configured externally."""
    choice = os.environ.get("DMFT_ED_COMPILE_CACHE", "").strip()
    if choice.lower() in ("0", "off", "none", "false"):
        return None
    # Pure-CPU processes (tests/dryruns force JAX_PLATFORMS=cpu via env or
    # the config API) skip the cache unless explicitly pointed at one:
    # local CPU compiles are fast, and XLA:CPU AOT cache loads log spurious
    # machine-feature warnings.
    plats = getattr(jax.config, "jax_platforms", None) \
        or os.environ.get("JAX_PLATFORMS", "")
    if not choice and plats and \
            all(p.strip() in ("cpu", "") for p in plats.split(",")):
        return None
    try:
        existing = jax.config.jax_compilation_cache_dir
    except AttributeError:    # very old jax; nothing to do
        return None
    if existing:
        return None    # respect an explicit user configuration
    path = choice or os.path.join(
        os.path.expanduser("~"), ".cache", "dmft_ed_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every compile: tunnel dispatch makes even sub-second compiles
    # worth a ~ms disk hit, and the large-sector programs are the minutes
    # that matter
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
