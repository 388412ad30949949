"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's all-CPU test strategy (SURVEY.md §4) while adding
the idiomatic JAX fake-cluster: ``xla_force_host_platform_device_count=8``
lets the sharding/pjit paths execute without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
