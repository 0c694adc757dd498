"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding paths are exercised
on a virtual CPU mesh per the reference test strategy (SURVEY.md section 4d).

Note: this environment preloads jax via sitecustomize, so JAX_PLATFORMS set
here via os.environ would be ignored; jax.config.update works at any point
before backend initialization.
"""
import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
