"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's all-CPU test strategy (SURVEY.md §4) while adding
the idiomatic JAX fake-cluster: ``xla_force_host_platform_device_count=8``
lets the sharding/pjit paths execute without TPU hardware.

Note: this environment pins ``JAX_PLATFORMS=axon`` via sitecustomize and
the env var alone cannot override it — ``jax.config.update`` can. Set
``FDIFF_TEST_TPU=1`` to run the suite on the real TPU chip instead
(exercises the Mosaic kernels; looser numerical tolerances apply).
"""

import os
import sys
from pathlib import Path

ON_TPU = os.environ.get("FDIFF_TEST_TPU") == "1"

if not ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
