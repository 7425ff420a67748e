"""Early pytest plugin: force the JAX CPU platform with 8 virtual devices.

This image's sitecustomize registers the axon TPU plugin at interpreter
start, which locks jax to the real TPU chip before any conftest runs —
making the unit suite run every compile through the TPU tunnel. This plugin
is loaded via ``-p pytest_force_cpu`` in pytest.ini, which imports it
*before* pytest starts fd-level output capture, so the re-exec below keeps
the terminal attached.
"""

import os
import sys

if (os.environ.get("_VFI_TEST_REEXEC") != "1"
        and os.environ.get("JAX_PLATFORMS") != "cpu"):
    env = dict(os.environ)
    env["_VFI_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""   # skip axon plugin registration
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
