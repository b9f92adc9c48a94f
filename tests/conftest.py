"""Test harness: force an 8-device virtual CPU mesh.

The environment pins JAX_PLATFORMS=axon (single remote TPU chip behind a
tunnel); unit tests must run locally and exercise multi-chip sharding, so we
override to CPU with 8 virtual devices before any computation happens.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
