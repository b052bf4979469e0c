import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multichip path). Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xf = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

DRB1 = "/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-a70-K16-k8-w10000-j5000-e5000.seqwish.gfa"


@pytest.fixture(scope="session")
def drb1_path():
    return DRB1
