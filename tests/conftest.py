"""Test configuration: run everything on a virtual 8-device CPU platform.

Tests force JAX onto CPU with 8 virtual devices
(``--xla_force_host_platform_device_count=8``) so the mesh/sharding tests
exercise real multi-device compilation without TPU hardware — the
fake-backend capability the reference's single-GPU test harness never
had (SURVEY.md §4). Must run before the first ``import jax``.
"""

import os
import sys

# force CPU even when the environment pre-registers a TPU backend (axon):
# unit tests must be fast and hardware-independent; TPU runs happen via bench.py
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# a sitecustomize hook may have force-registered a TPU platform and set
# jax_platforms past the env var — override it back after import
jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import cnn_sr_tpu` works from any cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
