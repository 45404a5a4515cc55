"""Test environment: force CPU backend with 8 virtual devices.

Multi-device sharding logic (mesh collectives, shard_map steps) is exercised
on a virtual 8-device CPU mesh, per SURVEY.md §4 — no pod required.

The environment may pre-register a live TPU tunnel backend at interpreter
startup (sitecustomize calling jax.config.update("jax_platforms", ...)), so
env vars alone don't stick — override the config directly before any backend
initialization. Set GS_TPU_TEST_PLATFORM=tpu (or axon) to run the suite
against real hardware instead.
"""

import os

import jax

_platform = os.environ.get("GS_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
