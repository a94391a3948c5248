"""Test config: run on a virtual 8-device CPU mesh with float64 enabled.

float64 matches the reference's ``net.double()`` numerics (``train.py:222``)
for golden-value comparisons; the 8 virtual devices exercise the sharding
path without TPU hardware (SURVEY.md §4.4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the box presets axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
# The axon TPU plugin force-sets jax_platforms="axon,cpu" from
# sitecustomize; tests must run on the virtual CPU mesh.
from mdgat_tpu.core.platform import force_platform  # noqa: E402

force_platform("cpu")

jax.config.update("jax_enable_x64", True)
# single-core box: persistent compile cache makes repeat test runs cheap.
# Machine-keyed dir: CPU AOT entries are ISA-specific, and the driver has
# moved this repo across host types mid-round (SIGILL-risk warnings).
from mdgat_tpu.core.platform import machine_keyed_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", machine_keyed_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

