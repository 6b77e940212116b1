"""Test harness: force an 8-device fake CPU mesh before any backend init.

This is the JAX-native multi-device test mechanism the reference lacks
(its distributed paths only run under torchrun with >=2 GPUs, SURVEY §4):
every sharding/collective test here runs on any machine.

jax may already be imported by the interpreter's sitecustomize, so the
platform override must go through jax.config (env vars are read at jax
import time and would be ignored here); backends initialize lazily, so
this works as long as no device has been touched yet.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert len(jax.devices()) == 8, "expected 8 fake CPU devices for tests"


@pytest.fixture
def x64():
    """Per-test float64 mode for machine-precision derivative checks."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)
