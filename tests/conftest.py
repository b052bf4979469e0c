import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multichip path). Must be set before jax import.
# force CPU even when the ambient environment points JAX at a TPU tunnel
# (the axon sitecustomize registers the TPU plugin at interpreter start and
# overrides JAX_PLATFORMS, so we must also reset the jax config directly)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
xf = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

DRB1 = "/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-a70-K16-k8-w10000-j5000-e5000.seqwish.gfa"


@pytest.fixture(scope="session")
def drb1_path():
    return DRB1
